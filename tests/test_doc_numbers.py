"""Headline numbers in the docs match the bench of record (VERDICT r4 item 7).

Round 3 and round 4 both flagged doc/number drift (ProgGAN render quoted as
795 / 838 / 840.5 / 856.4 across four files). The fix is mechanical: every
doc sentence that states a current benchmark number carries an HTML marker
``<!-- bench:KEY -->`` (optionally ``<!-- bench:KEY:SCALE -->`` for scaled
units, e.g. ``:1e6`` for "20.7M"), and this test asserts the number written
immediately before each marker matches ``bench_details.json[KEY]`` within
1.5% (docs print rounded values). Historical/superseded numbers simply don't
get a marker — but the REQUIRED_README_KEYS set below pins the headline
claims so the convention cannot silently rot away.
"""
import json
import os.path as osp
import re

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
DOCS = ("README.md", "PERFORMANCE.md", "NOTES.md")
MARKER = re.compile(r"<!--\s*bench:([A-Za-z0-9_]+)(?::([0-9.e+-]+))?\s*-->")
NUMBER = re.compile(r"(\d+(?:\.\d+)?)")

# The headline claims README must state from the bench of record.
REQUIRED_README_KEYS = {
    "stylegan2_1024_traversal_images_per_sec",
    "stylegan2_1024_train_steps_per_sec_bs12",
    "proggan_1024_render_images_per_sec",
    "warp_grad_evals_per_sec_pallas",
    "sngan_mnist_train_steps_per_sec",
}


def _bench():
    with open(osp.join(REPO, "bench_details.json")) as f:
        return json.load(f)


def _marked_numbers(doc):
    """Yield (lineno, key, scale, doc_value) for every marker in the doc."""
    with open(osp.join(REPO, doc)) as f:
        for lineno, line in enumerate(f, 1):
            pos = 0
            for m in MARKER.finditer(line):
                before = line[pos:m.start()]
                pos = m.end()
                nums = NUMBER.findall(before)
                assert nums, (
                    f"{doc}:{lineno}: marker bench:{m.group(1)} has no number "
                    f"before it on the line")
                scale = float(m.group(2)) if m.group(2) else 1.0
                yield lineno, m.group(1), scale, float(nums[-1])


@pytest.mark.parametrize("doc", DOCS)
def test_doc_numbers_match_bench_of_record(doc):
    bench = _bench()
    checked = 0
    for lineno, key, scale, doc_val in _marked_numbers(doc):
        assert key in bench, f"{doc}:{lineno}: unknown bench key {key!r}"
        true = float(bench[key]) / scale
        rel = abs(doc_val - true) / max(abs(true), 1e-12)
        assert rel <= 0.015, (
            f"{doc}:{lineno}: {key} written as {doc_val} but the bench of "
            f"record says {true:.4g} (drift {rel:.1%}) — update the doc or "
            f"re-run bench.py")
        checked += 1
    if doc == "README.md":
        assert checked > 0


def test_readme_marks_the_headline_claims():
    found = {key for _, key, _, _ in _marked_numbers("README.md")}
    missing = REQUIRED_README_KEYS - found
    assert not missing, (
        f"README.md no longer marks these headline claims with "
        f"<!-- bench:KEY --> markers: {sorted(missing)}")
