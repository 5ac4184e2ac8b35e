"""Ranking engine tests: correlation math vs a direct transcription of the
reference formula, plus the rank CLI file-output contract."""
import json
import os.path as osp

import numpy as np

from warpedganspace_tpu.ranking.engine import (
    ATTRIBUTE_RANGES,
    l1_normalize_rows,
    path_attribute_correlations,
)


def _reference_corr(attrs, names):
    """Direct loop transcription of the reference metric
    (rank_interpretable_paths.py:382-398)."""
    ranges = np.stack([np.array(ATTRIBUTE_RANGES[a]) for a in names])
    s_n, k_n, a_n, t_n = attrs.shape
    out = np.zeros((s_n, k_n, a_n))
    for s in range(s_n):
        for k in range(k_n):
            A = attrs[s, k]
            A_scaled = (2.0 * (A.T - ranges[:, 0]) / (ranges[:, 1] - ranges[:, 0]) - 1.0).T
            A_scaled[A_scaled < -1.0] = -1.0
            A_scaled[A_scaled > 1.0] = 1.0
            for t in range(a_n):
                A_t = A_scaled[t]
                A_t_idx = np.arange(t_n)
                if names[t] == "identity":
                    A_t_idx = np.concatenate(
                        [-1 * np.arange(-t_n // 2 + 1, 0), np.arange(t_n // 2 + 1)]
                    )
                out[s, k, t] = np.cov(A_t, A_t_idx)[0, 1] / np.sqrt(np.cov(A_t_idx))
    return out


def test_correlation_matches_reference_formula():
    rng = np.random.RandomState(0)
    names = ["au_12_Lip_Corner_Puller", "identity", "yaw"]
    attrs = rng.rand(2, 4, 3, 9)
    attrs[:, :, 0] *= 5.0       # AU range
    attrs[:, :, 2] = attrs[:, :, 2] * 2 - 1  # yaw-ish
    got = path_attribute_correlations(attrs, names)
    want = _reference_corr(attrs, names)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_monotone_attribute_ranks_first():
    """A path whose attribute increases monotonically must out-rank noise paths."""
    rng = np.random.RandomState(1)
    t = 11
    attrs = 0.5 + 0.01 * rng.randn(1, 5, 1, t)
    attrs[0, 3, 0] = np.linspace(0.2, 0.8, t)  # strongly correlated path
    corr = np.abs(path_attribute_correlations(attrs, ["gender"]))[0]
    assert int(np.argmax(corr[:, 0])) == 3


def test_l1_normalize_rows():
    x = np.array([[1.0, -3.0], [2.0, 2.0]])
    out = l1_normalize_rows(x)
    np.testing.assert_allclose(np.abs(out).sum(axis=1), 1.0)


def test_rank_cli_outputs(tmp_path, monkeypatch):
    """Run the rank CLI over synthetic eval_np arrays; check the output tree."""
    from warpedganspace_tpu.cli import rank_interpretable_paths as rank_cli

    monkeypatch.chdir(tmp_path)
    exp = tmp_path / "exp"
    hashes_root = exp / "results" / "mini" / "6_0.2_1.2"
    rng = np.random.RandomState(2)
    for h in ("aaa", "bbb"):
        np_dir = hashes_root / h / "eval_np"
        np_dir.mkdir(parents=True)
        for attr in ("celeba_bangs", "identity"):
            np.save(np_dir / f"{attr}.npy", rng.rand(4, 7))

    rank_cli.main([
        "--exp", str(exp), "--pool", "mini", "--shift-steps", "3", "--eps", "0.2",
        "--attr-group", "Bangs", "--no-gif",
    ])

    root = hashes_root / "interpretable_paths" / "Group_Bangs"
    assert (root / "attributes_traversals_details.json").is_file()
    assert (root / "interpretable_paths.json").is_file()
    assert (root / "corr" / "attr_idx_corr.csv").is_file()
    assert (root / "corr" / "attr_idx_corr_sorted_by_celeba_bangs.csv").is_file()
    assert (root / "corr" / "attr_idx_corr_diag.csv").is_file()
    assert (root / "corr_l1" / "attr_idx_corr_l1.csv").is_file()
    assert (root / "top-3_interpretable_path_Bangs.md").is_file()
    with open(root / "interpretable_paths.json") as f:
        d = json.load(f)
    assert sorted(d["corr"]["celeba_bangs"]) == [0, 1, 2, 3]
    with open(root / "attributes_traversals_details.json") as f:
        det = json.load(f)
    assert det["num_of_paths"] == 4 and det["num_of_points_per_path"] == 7


def test_rank_cli_eps_autodiscovery_and_rerun_after_ranking(tmp_path, monkeypatch):
    """Omitting --eps scans existing traversal-config dirs (the reference's
    documented-but-unreachable fallback), and the hash listing skips the
    interpretable_paths/ output of a previous ranking run."""
    from warpedganspace_tpu.cli import rank_interpretable_paths as rank_cli

    monkeypatch.chdir(tmp_path)
    exp = tmp_path / "exp"
    hashes_root = exp / "results" / "mini" / "6_0.2_1.2"
    rng = np.random.RandomState(3)
    for h in ("aaa", "bbb"):
        np_dir = hashes_root / h / "eval_np"
        np_dir.mkdir(parents=True)
        for attr in ("celeba_bangs", "identity"):
            np.save(np_dir / f"{attr}.npy", rng.rand(4, 7))

    args = ["--exp", str(exp), "--pool", "mini", "--attr-group", "Bangs", "--no-gif"]
    rank_cli.main(args)          # no --eps: auto-discovers 6_0.2_1.2
    root = hashes_root / "interpretable_paths" / "Group_Bangs"
    assert (root / "interpretable_paths.json").is_file()
    rank_cli.main(args)          # re-run must skip interpretable_paths/


def test_rank_cli_gif_outputs(tmp_path, monkeypatch):
    """The rank CLI's GIF branch (default-on, reference :119-178): summarizing
    GIFs per top-k path per attribute plus the markdown that embeds them —
    exercised with real path images on disk."""
    from PIL import Image

    from warpedganspace_tpu.cli import rank_interpretable_paths as rank_cli

    monkeypatch.chdir(tmp_path)
    exp = tmp_path / "exp"
    hashes_root = exp / "results" / "mini" / "6_0.2_1.2"
    rng = np.random.RandomState(4)
    T = 7
    for h in ("aaa", "bbb"):
        np_dir = hashes_root / h / "eval_np"
        np_dir.mkdir(parents=True)
        for attr in ("celeba_bangs", "identity"):
            np.save(np_dir / f"{attr}.npy", rng.rand(4, T))
        # Path images + the original image the summarizing GIF composites.
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            hashes_root / h / "original_image.jpg")
        for k in range(4):
            p_dir = hashes_root / h / "paths_images" / f"path_{k:03d}"
            p_dir.mkdir(parents=True)
            for t in range(T):
                Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)
                                ).save(p_dir / f"{t:06d}.jpg")

    rank_cli.main([
        "--exp", str(exp), "--pool", "mini", "--shift-steps", "3",
        "--eps", "0.2", "--attr-group", "Bangs", "--gif", "--gif-size", "32",
        "--top-k", "2", "--num-imgs", "3",
    ])
    root = hashes_root / "interpretable_paths" / "Group_Bangs"
    gifs = sorted((root / "corr").rglob("*.gif"))
    assert gifs, "no summarizing GIFs written"
    for g in gifs:
        with Image.open(g) as im:
            assert im.n_frames >= 2 and im.size[1] == 32
    md = root / "top-2_interpretable_path_Bangs.md"
    assert md.is_file() and ".gif" in md.read_text()
