#!/usr/bin/env python
"""Quantify the pallas-boundary cost of the fused StyleGAN2 tail (VERDICT r4).

The round-3 finding: the fused tail kernel wins per-section isolated (54.4 vs
65.0 ms, 91.7 vs 104.2 at B=96 bf16) but loses end-to-end (240 vs 202 ms) to
(1) forfeited XLA cross-block fusion and (2) layout-conversion copies at every
pallas boundary. This script pins down (2) per edge from the compiled HLO and
A/Bs the candidate fixes in situ:

  python scripts/measure_sg2_boundary.py            # measure + HLO copy audit
  python scripts/measure_sg2_boundary.py hlo        # also dump the copy ops

Modes measured (full gen.apply, B=96 bf16, 1024^2):
  - foldx (production default)
  - pallas sections=2 (both 512/1024 blocks fused)
  - pallas sections=1 (1024 block only)
"""
import os
import os.path as osp
import re
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wgs_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T0 = time.perf_counter()


def log(m):
    print(f"[sg2-boundary +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed(fn, args, reps=10, rounds=3):
    sync(fn(*args))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        sync(o)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


_SHAPE_RE = re.compile(r"(bf16|f32|u8)\[([\d,]+)\]\{([\d,]+)\}")


def audit_copies(compiled_text, dump=False):
    """Find copy/transpose ops in the optimized HLO and size them."""
    total_bytes = 0
    rows = []
    for line in compiled_text.splitlines():
        s = line.strip()
        if not (" copy(" in s or "copy-start(" in s or " transpose(" in s
                or " bitcast-convert(" in s and "{" in s):
            continue
        m = _SHAPE_RE.search(s)
        if not m:
            continue
        dtype, dims, layout = m.groups()
        nbytes = {"bf16": 2, "f32": 4, "u8": 1}[dtype]
        for d in dims.split(","):
            nbytes *= int(d)
        if nbytes < 1 << 20:
            continue  # skip small copies
        total_bytes += nbytes
        rows.append((nbytes, s[:160]))
    rows.sort(reverse=True)
    for nbytes, s in rows[:12]:
        log(f"  copy {nbytes / 1e6:8.1f} MB :: {s}")
        if dump:
            print(s)
    return total_bytes


from warpedganspace_tpu.models.api import cast_params_bf16  # noqa: E402
from warpedganspace_tpu.models.stylegan2 import StyleGAN2Generator  # noqa: E402

B = 96
HBM_GBPS = 800e9  # v5e


def bench(layout, sections=None):
    if sections is not None:
        os.environ["WGS_SG2_PALLAS_SECTIONS"] = str(sections)
    import warpedganspace_tpu.models.stylegan2 as sg2

    # _PALLAS_SECTIONS is read at import; refresh for A/B.
    sg2._PALLAS_SECTIONS = int(os.environ.get("WGS_SG2_PALLAS_SECTIONS", "99"))
    gen = StyleGAN2Generator(resolution=1024, tail_layout=layout)
    params = cast_params_bf16(jax.jit(lambda k: gen.init(k))(jax.random.key(0)))
    z = jax.random.normal(jax.random.key(1), (B, 512), jnp.bfloat16)
    fn = jax.jit(lambda p, zz: gen.apply(p, zz))
    label = layout if sections is None else f"{layout}[sections={sections}]"
    log(f"compiling {label}...")
    t = timed(fn, (params, z))
    log(f"{label}: {t * 1e3:.1f} ms -> {B / t:.1f} img/s")
    compiled = fn.lower(params, z).compile()
    txt = compiled.as_text()
    n_copies = audit_copies(txt, dump=("hlo" in sys.argv))
    log(f"{label}: >=1MB copy/transpose bytes {n_copies / 1e9:.2f} GB "
        f"(~{n_copies / HBM_GBPS * 2 * 1e3:.1f} ms at r+w HBM floor)")
    return t


t_foldx = bench("foldx")
t_p2 = bench("pallas", sections=2)
t_p1 = bench("pallas", sections=1)
log(f"SUMMARY: foldx {t_foldx * 1e3:.1f} ms | pallas-2 {t_p2 * 1e3:.1f} | "
    f"pallas-1 {t_p1 * 1e3:.1f}")
