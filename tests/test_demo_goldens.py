"""Golden-output replication against the reference's SHIPPED demo ranking
(`/root/reference/demo/demo_interpretable_paths/` — the ProgGAN K=200/D512
model over 8 latent codes, 4 attributes, 41 points/path).

The demo ships the raw path-x-attribute correlation matrix
(``corr/attr_idx_corr.csv``) plus everything the ranking stage derives from
it: sorted CSVs, ``interpretable_paths.json``, and the top-3 markdown. The
eval_np INPUTS are not shipped (regenerating them needs the pretrained
weights — the weights-gated tests), but the whole post-correlation machinery
can be held to the goldens offline by re-deriving from the shipped matrix.

Precision caveat tested around: the CSV stores 3-decimal roundings while the
original sort used full-precision values, so path ranks may legally swap
WITHIN equal rounded values. The assertions therefore demand: byte-identical
matrix round-trip, rank agreement outside rounded ties, golden order
monotone under our values, exact top-3 per attribute, and the markdown's
(attribute, k, path_id) triples.
"""
import json
import os
import os.path as osp
import re

import numpy as np
import pandas as pd
import pytest

DEMO = "/root/reference/demo/demo_interpretable_paths"

pytestmark = pytest.mark.skipif(
    not osp.isdir(DEMO), reason="reference demo goldens not present")


@pytest.fixture(scope="module")
def demo_matrix():
    df = pd.read_csv(osp.join(DEMO, "corr", "attr_idx_corr.csv"),
                     index_col="path_id")
    golden = json.load(open(osp.join(DEMO, "interpretable_paths.json")))
    return df, golden


def test_corr_csv_roundtrip_byte_identical(demo_matrix, tmp_path):
    """Our save_results writes the IDENTICAL attr_idx_corr.csv bytes from the
    shipped matrix (header, path_id index label, %.3f format)."""
    from warpedganspace_tpu.cli.rank_interpretable_paths import save_results

    df, _ = demo_matrix
    attrs = list(df.columns)
    ip = {"corr": {}}
    md = {a: {} for a in attrs}
    save_results(attrs, df.to_numpy(), "corr", ip, md, create_gifs=False,
                 hashes=[], interpretable_paths_root=str(tmp_path))
    ours = open(tmp_path / "corr" / "attr_idx_corr.csv").read()
    theirs = open(osp.join(DEMO, "corr", "attr_idx_corr.csv")).read()
    assert ours == theirs


def test_rankings_match_goldens_up_to_rounding(demo_matrix):
    """Per attribute: our descending sort of the shipped matrix equals the
    golden ranking except inside equal-rounded-value ties; the golden order is
    monotone under our values; the top-3 path ids match exactly."""
    df, golden = demo_matrix
    for a in df.columns:
        ours = df.sort_values(by=a, ascending=False).index.tolist()
        gold = golden["corr"][a]
        assert ours[:3] == gold[:3], a
        vals = df[a]
        for i, (x, y) in enumerate(zip(ours, gold)):
            if x != y:
                assert abs(vals[x] - vals[y]) < 1e-9, (a, i, x, y)
        gv = [vals[p] for p in gold]
        assert all(gv[i] >= gv[i + 1] - 1e-9 for i in range(len(gv) - 1)), a


def test_l1_metric_matches_goldens_within_rounding(demo_matrix):
    """corr_l1 derives from l1-row-normalizing the (full-precision) matrix;
    from the 3-decimal shipped matrix our l1 values must agree with the
    shipped corr_l1 values to within the rounding-error bound, and the golden
    l1 ranking must be monotone under our l1 values at that tolerance."""
    from warpedganspace_tpu.ranking.engine import l1_normalize_rows

    df, golden = demo_matrix
    A_l1 = l1_normalize_rows(df.to_numpy())
    df_l1 = pd.DataFrame(A_l1, index=df.index, columns=df.columns)
    shipped = pd.read_csv(osp.join(DEMO, "corr_l1", "attr_idx_corr_l1.csv"),
                          index_col="path_id")
    # Error bound: each input carries up to 5e-4 of rounding, amplified by
    # 1/||row||_1 in the normalization (weak rows as low as ~0.38 here), plus
    # the denominator coupling -> ~3e-3 worst case observed; assert 5e-3.
    np.testing.assert_allclose(df_l1.loc[shipped.index].to_numpy(),
                               shipped.to_numpy(), atol=5e-3)
    for a in df.columns:
        gv = [df_l1[a][p] for p in golden["corr_l1"][a]]
        assert all(gv[i] >= gv[i + 1] - 5e-3 for i in range(len(gv) - 1)), a


def test_markdown_top3_triples_match(demo_matrix):
    """The shipped top-3 markdown's (attribute, k, path_id) GIF references for
    the corr metric must equal our top-3 from the shipped matrix."""
    df, _ = demo_matrix
    text = open(osp.join(DEMO, "top-3_interpretable_path_Age-CelebA.md")).read()
    triples = set()
    for m in re.finditer(r'src="corr/([a-z_]+)/\1_(\d)_(\d+)_[0-9a-f]+\.gif"', text):
        triples.add((m.group(1), int(m.group(2)), int(m.group(3))))
    assert triples, "no corr-metric GIF references parsed from the golden md"
    ours = set()
    for a in df.columns:
        top = df.sort_values(by=a, ascending=False).index.tolist()[:3]
        for k, pid in enumerate(top, start=1):
            ours.add((a, k, pid))
    # identity is excluded from the md (reference :201); compare the rest.
    assert triples == {t for t in ours if t[0] != "identity"}
