"""Full-pipeline integration: sample -> train -> traverse -> attribute-space
evaluation -> ranking, on a tiny SNGAN_MNIST config with random generator and
random predictor weights. Validates the cross-stage filesystem contract
end-to-end (eval_json/eval_np schema feeding the ranking CLI)."""
import json
import os.path as osp

import numpy as np
import pytest

from tests.reference_utils import import_reference_module, state_dict_numpy, torch_or_skip


@pytest.fixture(scope="module")
def random_predictors():
    """Predictors built from randomly initialized reference torch modules."""
    torch = torch_or_skip()
    from warpedganspace_tpu.evalzoo.arcface import IDComparator
    from warpedganspace_tpu.evalzoo.celeba import CelebaAttrPredictor
    from warpedganspace_tpu.evalzoo.fairface import FairFace
    from warpedganspace_tpu.evalzoo.fanau import AUdetector
    from warpedganspace_tpu.evalzoo.hopenet import Hopenet
    from warpedganspace_tpu.evalzoo.sfd import SFDDetector

    torch.manual_seed(0)
    s3fd_mod = import_reference_module("lib.evaluation.sfd.net_s3fd")
    arc_mod = import_reference_module("lib.evaluation.archface.arcface")
    hope_mod = import_reference_module("lib.evaluation.hopenet.hopenet")
    celeba_mod = import_reference_module("lib.evaluation.celeba_attributes.celeba_attr_predictor")
    au_mod = import_reference_module("lib.evaluation.au_detector.hourglass")

    attr_file = "/root/reference/lib/evaluation/celeba_attributes/attributes_5.json"

    sfd = SFDDetector.from_state_dict(state_dict_numpy(s3fd_mod.s3fd()))
    idc = IDComparator.from_state_dict(
        state_dict_numpy(arc_mod.SE_IR(50, 0.4, "ir_se")), prefix="")
    hp = Hopenet.from_state_dict(
        state_dict_numpy(hope_mod.Hopenet(celeba_mod.Bottleneck, [3, 4, 6, 3], 66)))
    celeba = CelebaAttrPredictor.from_state_dict(
        state_dict_numpy(celeba_mod.ResNet(celeba_mod.Bottleneck, [3, 4, 6, 3],
                                           attr_file=attr_file)), attr_file)
    au = AUdetector.from_state_dict(state_dict_numpy(au_mod.FANAU(num_modules=1, n_points=12)))

    # FairFace: torchvision-shaped resnet34 built from reference blocks.
    nn_t = torch.nn

    class FF(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn_t.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn_t.BatchNorm2d(64)
            for li, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], start=1
            ):
                downsample = None
                if stride != 1 or self.inplanes != planes:
                    downsample = nn_t.Sequential(
                        celeba_mod.conv1x1(self.inplanes, planes, stride),
                        nn_t.BatchNorm2d(planes))
                layers = [celeba_mod.BasicBlock(self.inplanes, planes, stride, downsample)]
                self.inplanes = planes
                layers += [celeba_mod.BasicBlock(planes, planes) for _ in range(1, blocks)]
                setattr(self, f"layer{li}", nn_t.Sequential(*layers))
            self.fc = nn_t.Linear(512, 18)

    ff = FairFace.from_state_dict(state_dict_numpy(FF()))
    return {"sfd": sfd, "id": idc, "fairface": ff, "hopenet": hp, "au": au, "celeba": celeba}


def test_attribute_and_ranking_e2e(tmp_path, monkeypatch, random_predictors):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WGS_ALLOW_RANDOM_G", "1")

    from warpedganspace_tpu.cli import (
        rank_interpretable_paths,
        sample_gan,
        train,
        traverse_attribute_space,
        traverse_latent_space,
    )

    sample_gan.main(["-g", "SNGAN_MNIST", "--num-samples", "1", "--pool", "p1", "--seed", "3"])
    train.main([
        "--gan-type", "SNGAN_MNIST", "--reconstructor-type", "LeNet",
        "-K", "2", "-D", "2", "--min-shift-magnitude", "0.15",
        "--max-shift-magnitude", "0.25", "--max-iter", "2", "--batch-size", "2",
        "--log-freq", "2", "--ckp-freq", "2",
    ])
    exp = osp.join("experiments", "complete", "SNGAN_MNIST-LeNet-K2-D2-eps0.15_0.25")
    traverse_latent_space.main([
        "--exp", exp, "--pool", "p1", "--shift-steps", "2", "--eps", "0.2",
    ])

    monkeypatch.setattr(traverse_attribute_space, "load_predictors", lambda: random_predictors)
    traverse_attribute_space.main([
        "--exp", exp, "--pool", "p1", "--shift-steps", "2", "--eps", "0.2",
    ])

    res = osp.join(exp, "results", "p1", "4_0.2_0.8")
    hashes = [d for d in __import__("os").listdir(res)
              if osp.isdir(osp.join(res, d)) and d not in ("paths_gifs",)]
    assert len(hashes) == 1
    np_dir = osp.join(res, hashes[0], "eval_np")
    json_dir = osp.join(res, hashes[0], "eval_json")

    # --multi-device (VERDICT r3 item 7): the frame batches shard over the
    # virtual 8-device mesh (path length 5 pads to 8 by repeating the last
    # frame); every eval_np array must reproduce the single-device result.
    import os
    import shutil

    single_np = {f: np.load(osp.join(np_dir, f)) for f in os.listdir(np_dir)}
    shutil.rmtree(np_dir)
    shutil.rmtree(json_dir)
    traverse_attribute_space.main([
        "--exp", exp, "--pool", "p1", "--shift-steps", "2", "--eps", "0.2",
        "--multi-device",
    ])
    multi_np = {f: np.load(osp.join(np_dir, f)) for f in os.listdir(np_dir)}
    assert set(multi_np) == set(single_np)
    for f in single_np:
        np.testing.assert_allclose(multi_np[f], single_np[f], rtol=1e-4,
                                   atol=1e-5, err_msg=f)

    # Full eval_np schema (reference :538-605).
    expected = [
        "face_width", "face_height", "identity", "age", "race", "gender",
        "yaw", "pitch", "roll", "celeba_bangs", "celeba_eyeglasses",
        "celeba_beard", "celeba_smiling", "celeba_age",
        "au_12_Lip_Corner_Puller", "au_26_Jaw_Drop",
    ]
    for name in expected:
        arr = np.load(osp.join(np_dir, name + ".npy"))
        assert arr.shape == (2, 5), name  # K=2 paths, 2*2+1 points
        assert np.all(np.isfinite(arr)), name
    for j in ("face_bbox", "identity", "pose", "au", "celeba_smiling"):
        assert osp.isfile(osp.join(json_dir, j + ".json"))

    # Ranking consumes the eval arrays.
    rank_interpretable_paths.main([
        "--exp", exp, "--pool", "p1", "--shift-steps", "2", "--eps", "0.2",
        "--attr-group", "Smiling-AU12", "--no-gif",
    ])
    root = osp.join(res, "interpretable_paths", "Group_Smiling-AU12")
    assert osp.isfile(osp.join(root, "interpretable_paths.json"))
    with open(osp.join(root, "interpretable_paths.json")) as f:
        d = json.load(f)
    assert sorted(d["corr"]["au_12_Lip_Corner_Puller"]) == [0, 1]
