"""Eval-zoo parity tests vs reference torch implementations (random weights,
eval mode, randomized BN running stats so normalization is exercised)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.reference_utils import (
    add_reference_to_path,
    import_reference_module,
    state_dict_numpy,
    torch_or_skip,
)


def _randomize_bn(torch, model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.5)


def test_sfd_parity():
    torch = torch_or_skip()
    s3fd = import_reference_module("lib.evaluation.sfd.net_s3fd").s3fd
    ref_detect = import_reference_module("lib.evaluation.sfd.detect")
    ref_nms = import_reference_module("lib.evaluation.sfd.bbox").nms

    torch.manual_seed(0)
    ref = s3fd().eval()

    from warpedganspace_tpu.evalzoo.sfd import SFDDetector

    det = SFDDetector.from_state_dict(state_dict_numpy(ref))

    rng = np.random.RandomState(0)
    img = rng.rand(1, 128, 128, 3).astype(np.float32) * 255.0

    # batch_detect feeds the net VERBATIM on both sides (the reference's batch
    # path never subtracts the BGR means — detect.py:33-75; only the
    # single-image detect() does).
    img_t = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
    ref_boxes = ref_detect.batch_detect(ref, img_t, device="cpu")

    got_boxes = det.batch_detect(img)
    assert got_boxes.shape == ref_boxes.shape
    np.testing.assert_allclose(got_boxes, ref_boxes, rtol=1e-2, atol=1e-3)

    # Full API including NMS + score filter.
    ref_keep = ref_nms(ref_boxes[0], 0.3)
    ref_final = [x for x in ref_boxes[0][ref_keep, :] if x[-1] > 0.5]
    got_final, _, _ = det.detect_from_batch(img)
    assert len(got_final[0]) == len(ref_final)

    # Single-image path: both sides subtract the means internally.
    ref_single = ref_detect.detect(ref, img[0], device="cpu")[0]
    keep = ref_nms(ref_single, 0.3)
    ref_single = [x for x in ref_single[keep, :] if x[-1] > 0.5]
    got_single = det.detect_from_image(img[0])
    assert len(got_single) == len(ref_single)
    for g, r in zip(got_single, ref_single):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-2, atol=1e-3)


def test_arcface_parity():
    torch = torch_or_skip()
    SE_IR = import_reference_module("lib.evaluation.archface.arcface").SE_IR

    torch.manual_seed(0)
    ref = SE_IR(50, drop_ratio=0.4, mode="ir_se").eval()
    _randomize_bn(torch, ref)

    from warpedganspace_tpu.evalzoo.arcface import IDComparator

    cmp_ = IDComparator.from_state_dict(state_dict_numpy(ref), prefix="")

    rng = np.random.RandomState(1)
    x1 = (rng.rand(1, 256, 256, 3).astype(np.float32) * 2 - 1)
    x2 = (rng.rand(1, 256, 256, 3).astype(np.float32) * 2 - 1)

    def ref_embed(x_nhwc):
        x = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
        x = x[:, :, 35:223, 32:220]
        x = torch.nn.AdaptiveAvgPool2d((112, 112))(x)
        with torch.no_grad():
            return ref(x)

    e1, e2 = ref_embed(x1), ref_embed(x2)
    ref_sim = float(torch.nn.CosineSimilarity(dim=1, eps=1e-6)(e1, e2).mean())
    got_sim = float(cmp_(jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(got_sim, ref_sim, rtol=1e-3, atol=1e-4)


def test_hopenet_parity():
    torch = torch_or_skip()
    RefHopenet = import_reference_module("lib.evaluation.hopenet.hopenet").Hopenet
    Bottleneck = import_reference_module(
        "lib.evaluation.celeba_attributes.celeba_attr_predictor").Bottleneck

    torch.manual_seed(0)
    ref = RefHopenet(Bottleneck, [3, 4, 6, 3], 66).eval()
    _randomize_bn(torch, ref)

    from warpedganspace_tpu.evalzoo.hopenet import Hopenet

    hn = Hopenet.from_state_dict(state_dict_numpy(ref))

    x = np.random.RandomState(2).rand(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ry, rp, rr = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    gy, gp, gr = hn(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gy), ry.numpy(), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gp), rp.numpy(), rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gr), rr.numpy(), rtol=1e-2, atol=1e-3)
    # Angle decode path.
    deg = np.asarray(Hopenet.angles_deg(gy))
    probs = torch.softmax(ry, dim=1)
    ref_deg = (probs * torch.arange(66, dtype=torch.float32)).sum(1) * 3 - 99
    np.testing.assert_allclose(deg, ref_deg.numpy(), rtol=1e-3, atol=1e-2)


def test_fairface_parity():
    torch = torch_or_skip()
    _celeba = import_reference_module("lib.evaluation.celeba_attributes.celeba_attr_predictor")
    BasicBlock, conv1x1 = _celeba.BasicBlock, _celeba.conv1x1

    nn_t = torch.nn

    class TorchResNet34(nn_t.Module):
        """torchvision-named resnet34 with an 18-way fc (the FairFace config,
        traverse_attribute_space.py:179-184)."""

        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn_t.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn_t.BatchNorm2d(64)
            self.relu = nn_t.ReLU()
            self.maxpool = nn_t.MaxPool2d(3, 2, 1)
            self.layer1 = self._make(BasicBlock, 64, 3)
            self.layer2 = self._make(BasicBlock, 128, 4, 2)
            self.layer3 = self._make(BasicBlock, 256, 6, 2)
            self.layer4 = self._make(BasicBlock, 512, 3, 2)
            self.avgpool = nn_t.AdaptiveAvgPool2d((1, 1))
            self.fc = nn_t.Linear(512, 18)

        def _make(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn_t.Sequential(
                    conv1x1(self.inplanes, planes, stride), nn_t.BatchNorm2d(planes))
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes
            layers += [block(planes, planes) for _ in range(1, blocks)]
            return nn_t.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    torch.manual_seed(0)
    ref = TorchResNet34().eval()
    _randomize_bn(torch, ref)

    from warpedganspace_tpu.evalzoo.fairface import FairFace

    ff = FairFace.from_state_dict(state_dict_numpy(ref))
    x = np.random.RandomState(3).rand(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ff(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-2, atol=1e-3)


def test_celeba_parity():
    torch = torch_or_skip()
    _celeba = import_reference_module("lib.evaluation.celeba_attributes.celeba_attr_predictor")
    Bottleneck, ResNet = _celeba.Bottleneck, _celeba.ResNet

    attr_file = "/root/reference/lib/evaluation/celeba_attributes/attributes_5.json"
    torch.manual_seed(0)
    ref = ResNet(Bottleneck, [3, 4, 6, 3], attr_file=attr_file).eval()
    _randomize_bn(torch, ref)

    from warpedganspace_tpu.evalzoo.celeba import CelebaAttrPredictor

    pred = CelebaAttrPredictor.from_state_dict(state_dict_numpy(ref), attr_file)
    x = np.random.RandomState(4).rand(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = pred(jnp.asarray(x))
    assert set(got) == set(ref_out) == {"Bangs", "Eyeglasses", "No_Beard", "Smiling", "Young"}
    for k in got:
        np.testing.assert_allclose(np.asarray(got[k]), ref_out[k].numpy(), rtol=1e-2, atol=1e-3)


def test_fanau_parity():
    torch = torch_or_skip()
    FANAU = import_reference_module("lib.evaluation.au_detector.hourglass").FANAU

    torch.manual_seed(0)
    ref = FANAU(num_modules=1, n_points=12).eval()
    _randomize_bn(torch, ref)

    from warpedganspace_tpu.evalzoo.fanau import AUdetector

    det = AUdetector.from_state_dict(state_dict_numpy(ref))

    img = np.random.RandomState(5).rand(2, 256, 256, 3).astype(np.float32) * 255.0

    # Reference detect_AU semantics (AU_detector.py:35-46).
    img_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    img_norm = (img_t - img_t.min()) / (img_t.max() - img_t.min())
    with torch.no_grad():
        heat = ref(img_norm)
    ref_int = torch.nn.MaxPool2d((64, 64))(heat).squeeze(-1).squeeze(-1).numpy()

    got = np.asarray(det.detect_AU(img))
    assert got.shape == ref_int.shape == (2, 12)
    np.testing.assert_allclose(got, ref_int, rtol=1e-2, atol=1e-3)


def test_native_nms_matches_numpy():
    """C++ NMS (native/sfd_post.cpp) == numpy greedy NMS incl. tie order."""
    from warpedganspace_tpu.native import load_native
    from warpedganspace_tpu.evalzoo import sfd as sfd_mod

    lib = load_native()
    if lib is None:
        pytest.skip("no C++ toolchain")

    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 200
        xy = rng.rand(n, 2) * 200
        wh = rng.rand(n, 2) * 60 + 5
        # Distinct scores: numpy argsort is unstable (introsort), so exact
        # tie order is not reproducible by ANY other implementation.
        scores = rng.rand(n)
        dets = np.concatenate([xy, xy + wh, scores[:, None]], axis=1).astype(np.float32)

        got = sfd_mod.nms(dets, 0.3)

        # numpy oracle (reference bbox.py:44-67 transcription)
        x1, y1, x2, y2, s = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
        areas = (x2 - x1 + 1) * (y2 - y1 + 1)
        order = s.argsort()[::-1]
        keep = []
        while order.size > 0:
            i = order[0]
            keep.append(i)
            xx1 = np.maximum(x1[i], x1[order[1:]])
            yy1 = np.maximum(y1[i], y1[order[1:]])
            xx2 = np.minimum(x2[i], x2[order[1:]])
            yy2 = np.minimum(y2[i], y2[order[1:]])
            w = np.maximum(0.0, xx2 - xx1 + 1)
            h = np.maximum(0.0, yy2 - yy1 + 1)
            ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
            order = order[np.where(ovr <= 0.3)[0] + 1]
        assert got == keep, trial


def test_device_crop_resize_matches_host_chain():
    """The device-side fused crop+resize (evalzoo/crop_resize.py) must
    reproduce the host chain crop_face -> resize_shorter -> center_crop
    (cv2 INTER_LINEAR) for a spread of face rectangles: tall, wide, tiny,
    edge-clamped, the no-detection full-frame default, and upscaled crops."""
    from warpedganspace_tpu.evalzoo.crop_resize import crop_resize, plan_crop_resize
    from warpedganspace_tpu.evalzoo.transforms import (
        crop_face,
        crop_rect,
        resize_center,
    )

    rng = np.random.RandomState(0)
    T, H, W = 7, 256, 256
    frames = (rng.rand(T, H, W, 3) * 255).astype(np.float32)
    bboxes = [
        [0, 0, 256, 256],        # no-detection default
        [40, 60, 200, 220],      # typical face
        [10, 10, 30, 250],       # tall sliver
        [10, 10, 250, 30],       # wide sliver
        [120, 120, 135, 140],    # tiny (upscale path)
        [200, 200, 256, 256],    # corner, margin-clamped
        [0, 0, 64, 64],          # small corner box
    ]
    for padding, size in ((0.0, 224), (0.25, 224), (0.0, 256)):
        rects = [crop_rect(b, H, W, padding) for b in bboxes]
        got = np.asarray(crop_resize(jnp.asarray(frames), plan_crop_resize(rects, size)))
        want = np.stack([
            resize_center(crop_face(frames, t, b, padding)[None], size)[0]
            for t, b in enumerate(bboxes)
        ])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3,
                                   err_msg=f"padding={padding} size={size}")


def test_device_crop_resize_fuzz_random_rects():
    """Fuzz: 40 random detector-plausible bboxes across paddings/sizes must
    match the host chain (guards the plan math's edge handling — truncating
    resize dims, round() center offsets, border clamps — over a wider space
    than the hand-picked cases above)."""
    from warpedganspace_tpu.evalzoo.crop_resize import crop_resize, plan_crop_resize
    from warpedganspace_tpu.evalzoo.transforms import (
        crop_face,
        crop_rect,
        resize_center,
    )

    rng = np.random.RandomState(7)
    H = W = 256
    frames = (rng.rand(40, H, W, 3) * 255).astype(np.float32)
    bboxes = []
    for _ in range(40):
        x1, y1 = rng.randint(0, 200, 2)
        bboxes.append([x1, y1, x1 + rng.randint(4, 256 - x1),
                       y1 + rng.randint(4, 256 - y1)])
    for padding, size in ((0.0, 224), (0.25, 224), (0.0, 256), (0.1, 112)):
        rects = [crop_rect(b, H, W, padding) for b in bboxes]
        got = np.asarray(crop_resize(jnp.asarray(frames),
                                     plan_crop_resize(rects, size)))
        want = np.stack([
            resize_center(crop_face(frames, t, b, padding)[None], size)[0]
            for t, b in enumerate(bboxes)
        ])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3,
                                   err_msg=f"padding={padding} size={size}")
