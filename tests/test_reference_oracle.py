"""Cross-framework END-TO-END oracle: run the reference's OWN executable
scripts against this framework's experiment tree and diff the outputs.

Every other parity test in this suite compares against a *transcription* of the
reference (a local numpy/torch re-implementation of its loops). A transcription
can share a misreading with the code it tests; the reference's own script
cannot. This module therefore:

1. saves a RANDOM-weight torch SNGAN_MNIST generator state dict where both
   frameworks' loaders expect it (``models/pretrained/generators/...``),
2. runs THIS framework's full CLI pipeline (sample_gan -> train ->
   traverse_latent_space) to produce a reference-format experiment tree,
3. runs the reference's real ``/root/reference/traverse_latent_space.py``
   (torch CPU, in a subprocess, with torchvision/skimage library stubs — the
   image has no torchvision) on a copy of the SAME tree and the SAME pool,
4. asserts: identical result-file sets, ``paths_latent_codes.pt`` allclose,
   and JPEG frames within a small gray-level bound.

Reference anchors: traverse_latent_space.py:333-495 (traversal loop),
sample_gan.py:156-179 (pool schema), models/gan_load.py:31-58 (build_sngan).
"""
import json
import os
import os.path as osp
import shutil
import subprocess
import sys

import numpy as np
import pytest

from tests.reference_utils import (
    REFERENCE_ROOT,
    import_reference_module,
    reference_available,
    torch_or_skip,
)

K, D = 3, 2
SHIFT_STEPS, EPS = 3, 0.2
RES_SUBDIR = "6_0.2_1.2"  # <2*steps>_<eps>_<round(2*steps*eps,3)>
POOL = "oracle"

# Subprocess driver: stub the two third-party libraries this host lacks
# (torchvision — tests/tv_stub.py, a functional re-implementation of the
# public-library pieces the reference uses; ToPILImage is what tensor2image
# needs, traverse_latent_space.py:26-41 — and skimage, imported transitively
# by lib/__init__ via the sfd detector), then execute the reference script
# unmodified as __main__. These are stubs of PUBLIC LIBRARIES, not of any
# reference code.
TV_STUB = osp.join(osp.dirname(osp.abspath(__file__)), "tv_stub.py")

DRIVER = r'''
import sys, types
import importlib.util

spec = importlib.util.spec_from_file_location("tv_stub", "TV_STUB_PATH")
tv_stub = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tv_stub)
tv_stub.install()

sk = types.ModuleType("skimage")
skio = types.ModuleType("skimage.io")
sk.io = skio
sys.modules.update({"skimage": sk, "skimage.io": skio})

import runpy
sys.path.insert(0, "REFERENCE_ROOT")
runpy.run_path("SCRIPT_PATH", run_name="__main__")
'''


def _write_reference_sngan_weights(torch, dst_path, seed=0):
    """Random-init the reference's own torch SNGAN_MNIST generator and save
    its state dict — the weights file BOTH frameworks load."""
    sn_gen = import_reference_module("models.SNGAN.sn_gen_resnet")
    dist = import_reference_module("models.SNGAN.distribution")
    torch.manual_seed(seed)
    G = sn_gen.make_resnet_generator(
        resnet_gen_config=sn_gen.SN_RES_GEN_CONFIGS["sn_resnet32"],
        img_size=32, channels=1,
        distribution=dist.NormalDistribution(128),
    )
    os.makedirs(osp.dirname(dst_path), exist_ok=True)
    torch.save(G.state_dict(), dst_path)


def _run_reference_script(script, sandbox, argv):
    driver = osp.join(sandbox, "_ref_driver.py")
    with open(driver, "w") as f:
        f.write(DRIVER
                .replace("TV_STUB_PATH", TV_STUB)
                .replace("REFERENCE_ROOT", REFERENCE_ROOT)
                .replace("SCRIPT_PATH", osp.join(REFERENCE_ROOT, script)))
    env = dict(os.environ)
    env.update({"MPLBACKEND": "Agg", "CUDA_VISIBLE_DEVICES": ""})
    proc = subprocess.run(
        [sys.executable, driver] + argv,
        cwd=sandbox, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"reference {script} failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}")
    return proc


@pytest.fixture(scope="module")
def oracle_tree(tmp_path_factory):
    """Build the shared fixture: one sandbox holding the weights file, the
    pool, OUR traversed experiment tree, and the REFERENCE-traversed copy."""
    if not reference_available():
        pytest.skip("reference implementation not mounted")
    torch = torch_or_skip()
    sandbox = str(tmp_path_factory.mktemp("oracle"))
    cwd = os.getcwd()
    os.chdir(sandbox)
    try:
        _write_reference_sngan_weights(
            torch, osp.join(sandbox, "models", "pretrained", "generators",
                            "SNGAN_MNIST", "generator.pt"))

        from warpedganspace_tpu.cli import sample_gan, train, traverse_latent_space

        sample_gan.main(["-g", "SNGAN_MNIST", "--num-samples", "2",
                         "--pool", POOL, "--seed", "7"])
        train.main([
            "--gan-type", "SNGAN_MNIST", "--reconstructor-type", "LeNet",
            "-K", str(K), "-D", str(D), "--learn-gammas",
            "--min-shift-magnitude", "0.15", "--max-shift-magnitude", "0.25",
            "--max-iter", "4", "--batch-size", "4",
            "--log-freq", "2", "--ckp-freq", "2",
        ])
        exp = osp.join("experiments", "complete",
                       f"SNGAN_MNIST-LeNet-K{K}-D{D}-LearnGammas-eps0.15_0.25")
        assert osp.isdir(exp)

        # Copy the tree for the reference BEFORE our traversal writes results,
        # so the reference runs on exactly what train.py exported.
        ref_exp = osp.join(sandbox, "ref_exp")
        os.makedirs(ref_exp)
        shutil.copy(osp.join(exp, "args.json"), ref_exp)
        shutil.copytree(osp.join(exp, "models"), osp.join(ref_exp, "models"))

        traverse_latent_space.main([
            "--exp", exp, "--pool", POOL,
            "--shift-steps", str(SHIFT_STEPS), "--eps", str(EPS),
        ])

        _run_reference_script(
            "traverse_latent_space.py", sandbox,
            ["--exp", ref_exp, "--pool", POOL,
             "--shift-steps", str(SHIFT_STEPS), "--eps", str(EPS), "-v"])

        ours = osp.join(sandbox, exp, "results", POOL, RES_SUBDIR)
        refs = osp.join(ref_exp, "results", POOL, RES_SUBDIR)
        assert osp.isdir(ours) and osp.isdir(refs)
        return {"sandbox": sandbox, "ours": ours, "refs": refs, "exp": exp,
                "ref_exp": ref_exp}
    finally:
        os.chdir(cwd)


def _file_set(root):
    out = set()
    for dirpath, _dirnames, filenames in os.walk(root):
        rel = osp.relpath(dirpath, root)
        for f in filenames:
            out.add(osp.normpath(osp.join(rel, f)))
    return out


def test_result_file_sets_identical(oracle_tree):
    """The reference script and our CLI emit the exact same result tree
    (hash dirs, path dirs, frame names, paths_latent_codes.pt,
    original_image.jpg) — the filesystem IS the pipeline bus (SURVEY §1)."""
    ours, refs = _file_set(oracle_tree["ours"]), _file_set(oracle_tree["refs"])
    assert ours == refs
    # sanity: the tree is non-trivial — 2 codes x (K paths x 7 frames + 2)
    n_jpg = sum(1 for f in ours if f.endswith(".jpg"))
    assert n_jpg == 2 * (K * (2 * SHIFT_STEPS + 1) + 1)


def test_paths_latent_codes_allclose(oracle_tree):
    """Traversed latent codes agree numerically with the reference's own
    iterative loop (traverse_latent_space.py:370-462) for every code/path/step."""
    torch = torch_or_skip()
    hashes = sorted(d for d in os.listdir(oracle_tree["ours"])
                    if osp.isdir(osp.join(oracle_tree["ours"], d)))
    assert len(hashes) == 2
    worst = 0.0
    for h in hashes:
        a = torch.load(osp.join(oracle_tree["ours"], h, "paths_latent_codes.pt"),
                       map_location="cpu")
        b = torch.load(osp.join(oracle_tree["refs"], h, "paths_latent_codes.pt"),
                       map_location="cpu")
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape == (K, 2 * SHIFT_STEPS + 1, 128)
        worst = max(worst, float(np.max(np.abs(a - b))))
    # f32 XLA-vs-torch drift over 3 normalized-gradient steps; codes are O(1).
    assert worst < 5e-5, f"latent-code divergence {worst}"


def test_rendered_frames_match(oracle_tree):
    """Every JPEG frame matches the reference's render of the same codes
    within a small gray-level bound (same adaptive min-max normalization,
    same PIL JPEG q75 encoder)."""
    from PIL import Image

    hashes = sorted(d for d in os.listdir(oracle_tree["ours"])
                    if osp.isdir(osp.join(oracle_tree["ours"], d)))
    n, worst_mean, worst_max = 0, 0.0, 0
    for h in hashes:
        for k in range(K):
            pdir = osp.join("paths_images", f"path_{k:03d}")
            for t in range(2 * SHIFT_STEPS + 1):
                fa = osp.join(oracle_tree["ours"], h, pdir, f"{t:06d}.jpg")
                fb = osp.join(oracle_tree["refs"], h, pdir, f"{t:06d}.jpg")
                a = np.asarray(Image.open(fa), dtype=np.int16)
                b = np.asarray(Image.open(fb), dtype=np.int16)
                assert a.shape == b.shape
                d = np.abs(a - b)
                worst_mean = max(worst_mean, float(d.mean()))
                worst_max = max(worst_max, int(d.max()))
                n += 1
    assert n == 2 * K * (2 * SHIFT_STEPS + 1)
    # A 1-gray-level quantization flip at a block edge ripples through the
    # 8x8 JPEG DCT; bound the mean tightly and the max loosely.
    assert worst_mean < 1.0, f"mean gray-level diff {worst_mean}"
    assert worst_max <= 24, f"max gray-level diff {worst_max}"


def test_rank_script_oracle(oracle_tree):
    """Run the reference's real rank_interpretable_paths.py on fabricated
    eval_np arrays (the attribute stage's output contract,
    rank_interpretable_paths.py:322-480) planted identically in both trees,
    and diff against OUR rank CLI: same file sets, byte-identical CSVs
    (same pandas on this host), equal JSON indices, equal md content."""
    sandbox = oracle_tree["sandbox"]
    hashes = sorted(d for d in os.listdir(oracle_tree["ours"])
                    if osp.isdir(osp.join(oracle_tree["ours"], d)))
    attrs = ("face_width", "face_height", "identity")  # group Face-WH
    rng = np.random.RandomState(42)
    for h in hashes:
        arrs = {a: rng.rand(K, 2 * SHIFT_STEPS + 1).astype(np.float64)
                for a in attrs}
        for root in (oracle_tree["ours"], oracle_tree["refs"]):
            np_dir = osp.join(root, h, "eval_np")
            os.makedirs(np_dir, exist_ok=True)
            for a, arr in arrs.items():
                np.save(osp.join(np_dir, a + ".npy"), arr)

    rank_args = ["--pool", POOL, "--shift-steps", str(SHIFT_STEPS),
                 "--eps", str(EPS), "--attr-group", "Face-WH",
                 "--gif-size", "64"]
    cwd = os.getcwd()
    os.chdir(sandbox)
    try:
        from warpedganspace_tpu.cli import rank_interpretable_paths

        rank_interpretable_paths.main(["--exp", oracle_tree["exp"]] + rank_args)
        _run_reference_script("rank_interpretable_paths.py", sandbox,
                              ["--exp", oracle_tree["ref_exp"]] + rank_args)
    finally:
        os.chdir(cwd)

    ours_ip = osp.join(oracle_tree["ours"], "interpretable_paths")
    refs_ip = osp.join(oracle_tree["refs"], "interpretable_paths")
    assert _file_set(ours_ip) == _file_set(refs_ip)
    group = "Group_Face-WH"
    for rel in sorted(f for f in _file_set(ours_ip) if f.endswith(".csv")):
        with open(osp.join(ours_ip, rel), "rb") as fa, \
                open(osp.join(refs_ip, rel), "rb") as fb:
            assert fa.read() == fb.read(), f"CSV mismatch: {rel}"
    for name in ("interpretable_paths.json", "attributes_traversals_details.json"):
        with open(osp.join(ours_ip, group, name)) as fa, \
                open(osp.join(refs_ip, group, name)) as fb:
            assert json.load(fa) == json.load(fb), f"JSON mismatch: {name}"
    md = f"top-3_interpretable_path_Face-WH.md"
    with open(osp.join(ours_ip, group, md)) as fa, \
            open(osp.join(refs_ip, group, md)) as fb:
        # hash iteration order may differ (listdir vs sorted); content may not
        assert sorted(fa.read().splitlines()) == sorted(fb.read().splitlines())


def test_checkpoint2model_script_oracle(oracle_tree):
    """Run the reference's real checkpoint2model.py (checkpoint2model.py:36-50)
    on the ref-side copy of OUR trainer's checkpoint.pt, run OUR
    checkpoint2model CLI on the original, and assert both emit the same
    iteration-stamped weight files with identical tensors."""
    torch = torch_or_skip()
    sandbox = oracle_tree["sandbox"]
    # checkpoint.pt lives in the WIP tree only — the wip->complete copy
    # excludes it, matching the reference's layout (train.py keeps wip/).
    wip_exp = osp.join("experiments", "wip", osp.basename(oracle_tree["exp"]))
    ours_models = osp.join(sandbox, wip_exp, "models")
    refs_models = osp.join(oracle_tree["ref_exp"], "models")
    assert osp.isfile(osp.join(ours_models, "checkpoint.pt"))
    # Both scripts must split the SAME checkpoint: plant ours in the ref copy.
    shutil.copy(osp.join(ours_models, "checkpoint.pt"), refs_models)

    cwd = os.getcwd()
    os.chdir(sandbox)
    try:
        from warpedganspace_tpu.cli import checkpoint2model

        checkpoint2model.main(["--exp", wip_exp])
        _run_reference_script("checkpoint2model.py", sandbox,
                              ["--exp", oracle_tree["ref_exp"]])
    finally:
        os.chdir(cwd)

    split = lambda d: sorted(f for f in os.listdir(d)
                             if f.startswith(("support_sets-", "reconstructor-")))
    names = split(ours_models)
    assert names == split(refs_models)
    assert len(names) == 2, names  # one stamped pair from one checkpoint iter
    for f in names:
        a = torch.load(osp.join(ours_models, f), map_location="cpu")
        b = torch.load(osp.join(refs_models, f), map_location="cpu")
        assert sorted(a.keys()) == sorted(b.keys()), f
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{f}:{k}")


def test_reference_pool_consumed_by_our_cli(oracle_tree):
    """Interop in the other direction: a pool created by the reference's own
    sample_gan.py (sample_gan.py:156-179) is consumed by OUR traversal CLI,
    and the reference's traversal of it matches ours."""
    torch = torch_or_skip()
    sandbox = oracle_tree["sandbox"]
    cwd = os.getcwd()
    os.chdir(sandbox)
    try:
        _run_reference_script(
            "sample_gan.py", sandbox,
            ["-g", "SNGAN_MNIST", "--num-samples", "1", "--pool", "refpool"])
        pool_dir = osp.join("experiments", "latent_codes", "SNGAN_MNIST", "refpool")
        hashes = [d for d in os.listdir(pool_dir)
                  if osp.isdir(osp.join(pool_dir, d))]
        assert len(hashes) == 1
        assert osp.isfile(osp.join(pool_dir, hashes[0], "latent_code.pt"))
        assert osp.isfile(osp.join(pool_dir, hashes[0], "image.jpg"))

        from warpedganspace_tpu.cli import traverse_latent_space

        traverse_latent_space.main([
            "--exp", oracle_tree["exp"], "--pool", "refpool",
            "--shift-steps", "2", "--eps", str(EPS),
        ])
        _run_reference_script(
            "traverse_latent_space.py", sandbox,
            ["--exp", oracle_tree["ref_exp"], "--pool", "refpool",
             "--shift-steps", "2", "--eps", str(EPS)])

        res = osp.join("results", "refpool", "4_0.2_0.8")
        a = torch.load(osp.join(oracle_tree["exp"], res, hashes[0],
                                "paths_latent_codes.pt"), map_location="cpu")
        b = torch.load(osp.join(oracle_tree["ref_exp"], res, hashes[0],
                                "paths_latent_codes.pt"), map_location="cpu")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    finally:
        os.chdir(cwd)
