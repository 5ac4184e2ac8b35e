"""Collective-traffic audit of compiled SPMD programs.

The data-parallel design claim (README "Data parallelism is sharding, not
code") is structural: the ONLY cross-chip traffic a train step needs is one
gradient all-reduce over the trainable S+R parameters — the frozen generator
is never synced, and the batch stays sharded end-to-end (no all-gathers).
These helpers make that claim checkable against the optimized HLO that XLA's
SPMD partitioner actually emits (used by ``scripts/measure_dp_scaling.py``
and ``tests/test_parallel.py``). The reference has no analog: its
``nn.DataParallel`` scatter/gathers full tensors through host glue
(lib/trainer.py:16-21).
"""
from __future__ import annotations

import re

import numpy as np

import jax

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
               "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
               "s16": 2, "u16": 2, "s4": 1, "u4": 1,
               "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3b11fnuz": 1,
               "f8e4m3fnuz": 1, "f8e5m2fnuz": 1, "f8e3m4": 1, "f8e4m3": 1,
               "c64": 8, "c128": 16,
               # zero-byte HLO types that can appear inside tuple shapes
               "token": 0, "opaque": 0}

_COLLECTIVE_PAT = re.compile(
    r"=\s*((?:\([^)]*\)|\S+))\s+"
    r"(all-reduce|reduce-scatter|all-gather|all-to-all|collective-permute)"
    r"(-start|-done)?\b",
    re.I)


def shape_bytes(shape_str: str) -> int:
    """``'f32[200,1024,512]'`` -> bytes; tuple shapes sum their elements.

    An unrecognized dtype raises instead of counting 0 bytes — a silently
    skipped collective output would invisibly weaken the "traffic <=
    trainable-grad bytes" regression assertion (tests/test_parallel.py)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            raise ValueError(
                f"unrecognized HLO dtype {dt!r} in collective shape "
                f"{shape_str!r}; add it to parallel.audit.DTYPE_BYTES")
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def audit_collectives(compiled) -> dict[str, tuple[int, int]]:
    """Sum output bytes of every collective op in an optimized HLO.

    Returns ``{kind: (count, total_bytes)}`` over all-reduce / reduce-scatter /
    all-gather / all-to-all / collective-permute. Async pairs are counted once:
    only the OP NAME's ``-start`` suffix skips a line (the done op carries the
    final shape and is counted) — matching ``-start`` anywhere in the line
    would also drop the done op, whose operand is named ``%...-start``.
    """
    by_kind: dict[str, list[int]] = {}
    for line in compiled.as_text().splitlines():
        m = _COLLECTIVE_PAT.search(line)
        if not m or m.group(3) == "-start":
            continue
        by_kind.setdefault(m.group(2), []).append(shape_bytes(m.group(1)))
    return {k: (len(v), sum(v)) for k, v in sorted(by_kind.items())}


def param_bytes(tree) -> int:
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))
