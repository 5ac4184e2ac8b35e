"""Executable END-TO-END oracle for the ATTRIBUTE stage: run the reference's
OWN ``traverse_attribute_space.py`` (torch CPU, subprocess, torchvision
stubbed — tests/tv_stub.py) against an experiment tree produced by THIS
framework, with BOTH frameworks loading the SAME fabricated predictor weight
files from the production ``models/pretrained/`` layout, and diff the
eval_np / eval_json outputs.

This closes the last transcription-only parity surface. The sibling
tests/test_attribute_parity.py compares the attribute stage against a local
*transcription* of the reference loop; here the reference's own script
executes — its real ``SFDDetector.detect_from_batch``
(lib/evaluation/sfd/sfd_detector.py:24-41), the ``detect.py`` batch decode,
``crop_face`` (traverse_attribute_space.py:37-58), the per-predictor score
math (:288-536) and the eval_json/eval_np writers (:538-605) — and must agree
with our CLI file-for-file and number-for-number. Unlike the parity test, OUR
side runs the production ``load_predictors()`` (evalzoo/load.py) against the
same on-disk weight files, so the loader path is exercised too.

Reference anchors: traverse_attribute_space.py:167-223 (predictor loading;
the celeba model-zoo resnet50 fetch is neutralized by planting an empty state
dict in a TORCH_HOME cache — its values are discarded by the strict
load_state_dict that follows, celeba_attr_predictor.py:188-191), :240-536
(per-hash loop), :538-605 (output schema).
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
    reference_available,
    torch_or_skip,
)
from tests.test_attribute_parity import build_torch_predictors

K, D = 2, 2
SHIFT_STEPS, EPS = 2, 0.2
RES_SUBDIR = "4_0.2_0.8"
POOL = "attrpool"
TV_STUB = osp.join(osp.dirname(osp.abspath(__file__)), "tv_stub.py")

# Subprocess driver: install the torchvision stub (a PUBLIC-LIBRARY
# re-implementation, tests/tv_stub.py) plus a bare skimage (imported
# transitively by lib/__init__ via sfd/core.py, never called on the batch
# path), then execute the reference script unmodified as __main__.
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


def _run_reference_script(script, sandbox, argv, extra_env=None, timeout=1800):
    driver = osp.join(sandbox, "_ref_attr_driver.py")
    with open(driver, "w") as f:
        f.write(DRIVER
                .replace("TV_STUB_PATH", TV_STUB)
                .replace("REFERENCE_ROOT", REFERENCE_ROOT)
                .replace("SCRIPT_PATH", osp.join(REFERENCE_ROOT, script)))
    env = dict(os.environ)
    env.update({"MPLBACKEND": "Agg", "CUDA_VISIBLE_DEVICES": ""})
    env.update(extra_env or {})
    proc = subprocess.run(
        [sys.executable, driver] + argv,
        cwd=sandbox, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"reference {script} failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}")
    return proc


def _save_predictor_weights(torch, mods):
    """Write the six fabricated state dicts at the exact relative paths BOTH
    frameworks load (reference traverse_attribute_space.py:167-223 and our
    evalzoo/load.py defaults)."""
    blobs = {
        "models/pretrained/sfd/s3fd-619a316812.pth": mods["sfd"].state_dict(),
        "models/pretrained/arcface/model_ir_se50.pth": mods["arc"].state_dict(),
        "models/pretrained/fairface/fairface_alldata_4race_20191111.pt":
            mods["fairface"].state_dict(),
        "models/pretrained/hopenet/hopenet_alpha2.pkl": mods["hopenet"].state_dict(),
        "models/pretrained/au_detector/disfa_adaptation_f0.pth":
            {"state_dict": mods["au"].state_dict()},
        "models/pretrained/celeba_attributes/eval_predictor.pth.tar":
            {"state_dict": mods["celeba"].state_dict()},
    }
    for rel, blob in blobs.items():
        os.makedirs(osp.dirname(rel), exist_ok=True)
        torch.save(blob, rel)


@pytest.fixture(scope="module")
def attr_oracle(tmp_path_factory):
    if not reference_available():
        pytest.skip("reference implementation not mounted")
    torch = torch_or_skip()
    sandbox = str(tmp_path_factory.mktemp("attr_oracle"))
    cwd = os.getcwd()
    saved_env = {k: os.environ.get(k) for k in ("WGS_ALLOW_RANDOM_G",)}
    os.chdir(sandbox)
    os.environ["WGS_ALLOW_RANDOM_G"] = "1"
    try:
        mods, _attr_file = build_torch_predictors(torch)
        _save_predictor_weights(torch, mods)

        # The reference resolves its attr_file relative to cwd
        # (traverse_attribute_space.py:220); stage the data file where it
        # expects it.
        os.makedirs("lib/evaluation/celeba_attributes", exist_ok=True)
        shutil.copy(
            osp.join(REFERENCE_ROOT, "lib/evaluation/celeba_attributes/attributes_5.json"),
            "lib/evaluation/celeba_attributes/attributes_5.json")

        # Neutralize celeba_attr_predictor's model-zoo fetch (no egress): an
        # empty cached state dict merges zero keys, and the real (fabricated)
        # checkpoint is strict-loaded right after.
        hub = osp.join(sandbox, "torch_home", "hub", "checkpoints")
        os.makedirs(hub, exist_ok=True)
        torch.save({}, osp.join(hub, "resnet50-19c8e357.pth"))

        # Guard: the fairface checkpoint must strict-load into the stub's
        # resnet34 exactly as the reference does (:179-184) — catches any key
        # drift between the fabricated dict and the stub's layout early.
        from tests import tv_stub

        probe = tv_stub.resnet34()
        probe.fc = torch.nn.Linear(probe.fc.in_features, 18)
        probe.load_state_dict(torch.load(
            "models/pretrained/fairface/fairface_alldata_4race_20191111.pt"))

        from warpedganspace_tpu.cli import (
            sample_gan,
            train,
            traverse_attribute_space,
            traverse_latent_space,
        )

        sample_gan.main(["-g", "SNGAN_MNIST", "--num-samples", "1",
                         "--pool", POOL, "--seed", "7"])
        train.main([
            "--gan-type", "SNGAN_MNIST", "--reconstructor-type", "LeNet",
            "-K", str(K), "-D", str(D), "--min-shift-magnitude", "0.15",
            "--max-shift-magnitude", "0.25", "--max-iter", "2",
            "--batch-size", "2", "--log-freq", "2", "--ckp-freq", "2",
        ])
        exp = osp.join("experiments", "complete",
                       f"SNGAN_MNIST-LeNet-K{K}-D{D}-eps0.15_0.25")
        traverse_latent_space.main([
            "--exp", exp, "--pool", POOL,
            "--shift-steps", str(SHIFT_STEPS), "--eps", str(EPS),
        ])

        # Copy the traversal tree for the reference BEFORE our attribute CLI
        # writes eval outputs, so both stages consume IDENTICAL inputs (same
        # JPEGs, same paths_latent_codes.pt) and the diff isolates the
        # attribute stage itself.
        ref_exp = osp.join(sandbox, "ref_attr_exp")
        os.makedirs(ref_exp)
        shutil.copy(osp.join(exp, "args.json"), ref_exp)
        shutil.copytree(osp.join(exp, "results"), osp.join(ref_exp, "results"))

        # OUR attribute stage: the production loader path, reading the same
        # fabricated weight files from models/pretrained/.
        traverse_attribute_space.main([
            "--exp", exp, "--pool", POOL,
            "--shift-steps", str(SHIFT_STEPS), "--eps", str(EPS),
        ])

        _run_reference_script(
            "traverse_attribute_space.py", sandbox,
            ["--exp", ref_exp, "--pool", POOL,
             "--shift-steps", str(SHIFT_STEPS), "--eps", str(EPS),
             "--no-cuda", "-v"],
            extra_env={"TORCH_HOME": osp.join(sandbox, "torch_home")})

        ours_res = osp.join(sandbox, exp, "results", POOL, RES_SUBDIR)
        refs_res = osp.join(ref_exp, "results", POOL, RES_SUBDIR)
        hashes = sorted(
            d for d in os.listdir(ours_res)
            if osp.isdir(osp.join(ours_res, d))
            and d not in ("paths_gifs", "validation_results"))
        assert len(hashes) == 1
        return {"ours": osp.join(ours_res, hashes[0]),
                "refs": osp.join(refs_res, hashes[0])}
    finally:
        os.chdir(cwd)
        for k, v in saved_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_eval_file_sets_identical(attr_oracle):
    """Both stages emit the exact same eval_np/eval_json file sets — the
    filesystem contract rank_interpretable_paths.py consumes (:538-605)."""
    for sub in ("eval_np", "eval_json"):
        ours = sorted(os.listdir(osp.join(attr_oracle["ours"], sub)))
        refs = sorted(os.listdir(osp.join(attr_oracle["refs"], sub)))
        assert ours == refs, sub
    n_np = len(os.listdir(osp.join(attr_oracle["ours"], "eval_np")))
    assert n_np == 26  # 14 scalar families + 12 AUs


def test_eval_np_allclose(attr_oracle):
    """Every eval_np array matches the reference script's within the same
    float-drift gates as the transcription parity test (conv-stack XLA-CPU vs
    torch ~1e-3 relative; argmax-derived scores are step functions and must
    pick identical argmaxes)."""
    np_dir = osp.join(attr_oracle["ours"], "eval_np")
    for name in sorted(os.listdir(np_dir)):
        got = np.load(osp.join(np_dir, name))
        want = np.load(osp.join(attr_oracle["refs"], "eval_np", name))
        assert got.shape == want.shape, name
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=2e-3,
                                   err_msg=name)


def _assert_json_close(a, b, path, rtol=1e-2, atol=2e-3):
    assert type(a) is type(b) or (isinstance(a, (int, float)) and
                                  isinstance(b, (int, float))), path
    if isinstance(a, dict):
        assert sorted(a) == sorted(b), path
        for k in a:
            _assert_json_close(a[k], b[k], f"{path}.{k}", rtol, atol)
    elif isinstance(a, list):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_json_close(x, y, f"{path}[{i}]", rtol, atol)
    elif isinstance(a, float) or isinstance(b, float):
        assert abs(a - b) <= atol + rtol * abs(b), f"{path}: {a} vs {b}"
    else:
        assert a == b, path


def test_eval_json_match(attr_oracle):
    """Every eval_json document matches structurally and numerically — the
    same keys (stringified path indices), same nesting (pose's
    [yaw, pitch, roll] triple, face_bbox's detected-only list), values within
    the float gates."""
    json_dir = osp.join(attr_oracle["ours"], "eval_json")
    names = sorted(os.listdir(json_dir))
    assert len(names) == 12
    for name in names:
        with open(osp.join(json_dir, name)) as fa, \
                open(osp.join(attr_oracle["refs"], "eval_json", name)) as fb:
            _assert_json_close(json.load(fa), json.load(fb), name)
