"""Microbenchmark: exact Q11 log2-LUT evaluation strategies on TPU.

The integer-exact VIF statistic (ops/vif_int.py:_statistic) needs
``t[m] = round(log2f(m) * 2048)`` for 16-bit mantissas, three times per
log-branch pixel.  Round 3 measured the naive ``jnp.take`` gather at
~7 ns/element on the chip (XLA:TPU has no fast per-element gather),
making the exact statistic ~30x slower than the rest of the pipeline.

Because t is monotone with unit steps (2049 distinct values), t[m] can be
recovered *exactly* from an approximate f32 candidate plus comparisons of
m against the exact integer breakpoints B[j] (smallest m with t[m] =
30720 + j):

    u(m)   = #{j in [1,2048] : B[j] <= m}        (= t[m] - 30720)
    idx    = clip(round(log2_f32(m) * 2048) - 30720, 1, 2048)
    u(m)   = idx - 2 + [m >= B(idx-1)] + [m >= B(idx)] + [m >= B(idx+1)]

which is correct for ANY candidate within +-1 of u — and every f32 log2
implementation is orders of magnitude inside that window (validated
exhaustively below and in tests/test_integer.py).  The strategies differ
only in how the breakpoint triple is fetched:

  take_big     baseline: one jnp.take per log into the 65537-entry table
  take_bp      candidate + three jnp.take into the 2050-entry breakpoints
  mxu_bp       candidate + breakpoint triple via a factorised one-hot
               matmul on the MXU: jdx = 128*hi + lo, planes packed as
               bf16-exact integers <= 256 (cur>>8, cur&255, d_prev,
               d_next), A = onehot(hi) @ T then a 16-wide select by lo
  arith_bp     candidate + breakpoints computed arithmetically,
               B(j) ~= ceil(32768 * 2^((j-0.5)/2048)), corrected to the
               true table by a setup-time patchset derived by running the
               formula on the SAME backend (so it is exact regardless of
               the backend's exp2 rounding); each patch flips a single
               (m, j) comparison

Run on the live chip:  python tools/microbench_lut.py [--sizes 8294400]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from pqa2_tpu.golden.log2lut import log2_table

LOG2_SCALE = 2048
_BIAS = 30720  # t[32768] = 15 * 2048


# ---------------------------------------------------------------- host data


@functools.lru_cache(None)
def _host_tables():
    t = log2_table().astype(np.int64)
    m_all = np.arange(32768, 65536)
    tv = t[m_all]
    js = np.arange(1, 2049)
    bp = m_all[np.searchsorted(tv, _BIAS + js, side="left")]
    ext = np.empty(2050, dtype=np.int32)
    ext[0] = 32768  # sentinel: <= every mantissa
    ext[1:2049] = bp
    ext[2049] = 65536  # sentinel: > every mantissa
    return t, ext


def _mxu_planes() -> np.ndarray:
    """(128, 64) bf16-exact plane pack: row hi = jdx>>4, col b*16 + lo."""
    _, ext = _host_tables()
    jdx = np.arange(2048)
    cur = ext[jdx + 1].astype(np.int64)
    planes = np.stack(
        [cur >> 8, cur & 255, cur - ext[jdx], ext[jdx + 2] - cur], 0
    )  # (4, 2048)
    assert planes.min() >= 0 and planes.max() <= 256
    # (4, 128, 16) -> (128, 4, 16) -> (128, 64)
    return (
        planes.reshape(4, 128, 16).transpose(1, 0, 2).reshape(128, 64)
    ).astype(np.float32)


# ------------------------------------------------------------- candidates


def _candidate(mf: jnp.ndarray) -> jnp.ndarray:
    """f32 index candidate, exhaustively within +-1 of the true value."""
    y = jnp.log2(mf) * jnp.float32(LOG2_SCALE)
    return jnp.clip(jnp.round(y) - jnp.float32(_BIAS), 1.0, 2048.0)


# -------------------------------------------------------------- strategies


def lut_take_big(m: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, m.astype(jnp.int32))


def lut_take_bp(m: jnp.ndarray, ext: jnp.ndarray) -> jnp.ndarray:
    mi = m.astype(jnp.int32)
    idx = _candidate(mi.astype(jnp.float32)).astype(jnp.int32)
    u = (
        idx
        - 2
        + (mi >= jnp.take(ext, idx - 1)).astype(jnp.int32)
        + (mi >= jnp.take(ext, idx)).astype(jnp.int32)
        + (mi >= jnp.take(ext, idx + 1)).astype(jnp.int32)
    )
    return u + jnp.int32(_BIAS)


def lut_mxu_bp(m: jnp.ndarray, planes: jnp.ndarray) -> jnp.ndarray:
    mf = m.astype(jnp.int32).astype(jnp.float32)
    idxf = _candidate(mf)
    jdx = idxf.astype(jnp.int32) - 1
    hi = jdx >> 4
    lo = jdx & 15
    hh = (hi[:, None] == jax.lax.iota(jnp.int32, 128)[None, :]).astype(
        jnp.bfloat16
    )
    a = jax.lax.dot_general(
        hh,
        planes.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(-1, 4, 16)
    ll = (lo[:, None] == jax.lax.iota(jnp.int32, 16)[None, :]).astype(
        jnp.float32
    )
    vals = jnp.sum(a * ll[:, None, :], axis=-1)  # (P, 4)
    cur = vals[:, 0] * 256.0 + vals[:, 1]
    b_prev = cur - vals[:, 2]
    b_next = cur + vals[:, 3]
    u = (
        idxf
        - 2.0
        + (mf >= b_prev).astype(jnp.float32)
        + (mf >= cur).astype(jnp.float32)
        + (mf >= b_next).astype(jnp.float32)
    )
    return (u + jnp.float32(_BIAS)).astype(jnp.int32)


def _bhat(j: jnp.ndarray) -> jnp.ndarray:
    """Formulaic breakpoint: ceil(32768 * 2^((j - 0.5) / 2048)) in f32."""
    g = (j.astype(jnp.float32) - jnp.float32(0.5)) * jnp.float32(2.0**-11)
    return jnp.ceil(jnp.float32(32768.0) * jnp.exp2(g))


@functools.lru_cache(None)
def _arith_patches(backend: str):
    """(j, m_critical, sign) triples where this backend's _bhat deviates
    from the true breakpoints — derived by running the formula on-device,
    so the per-pixel evaluation is exact whatever exp2 the backend has."""
    _, ext = _host_tables()
    js = np.arange(1, 2049)
    with jax.default_device(jax.devices(backend)[0]):
        bhat = np.asarray(jax.jit(_bhat)(jnp.asarray(js))).astype(np.int64)
    true_bp = ext[1:2049].astype(np.int64)
    bad = np.nonzero(bhat != true_bp)[0]
    deltas = bhat[bad] - true_bp[bad]
    assert np.all(np.abs(deltas) <= 1), (
        "backend exp2 deviates by >1 code; widen the patch encoding"
    )
    j_p = js[bad]
    m_p = np.minimum(bhat[bad], true_bp[bad])
    # [m >= true] - [m >= bhat] = sign at the single code m == min(...)
    sign = np.where(deltas > 0, 1, -1)
    return (
        tuple(int(x) for x in j_p),
        tuple(int(x) for x in m_p),
        tuple(int(x) for x in sign),
    )


def lut_arith_bp(m: jnp.ndarray, patches) -> jnp.ndarray:
    mi = m.astype(jnp.int32)
    mf = mi.astype(jnp.float32)
    idxf = _candidate(mf)
    jdx = idxf.astype(jnp.int32) - 1
    u = idxf - 2.0
    for d in range(3):
        u = u + (mf >= _bhat(jdx + d)).astype(jnp.float32)
    corr = jnp.zeros_like(mi)
    for j_p, m_p, s in zip(*patches):
        hit = (mi == m_p) & (jdx > j_p - 3) & (jdx <= j_p)
        corr = corr + jnp.where(hit, jnp.int32(s), jnp.int32(0))
    return u.astype(jnp.int32) + corr + jnp.int32(_BIAS)


# ------------------------------------------------------------------ driver


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[8294400])
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    backend = jax.default_backend()
    table_h, ext_h = _host_tables()
    table_d = jnp.asarray(table_h.astype(np.int32))
    ext_d = jnp.asarray(ext_h)
    planes_d = jnp.asarray(_mxu_planes())
    patches = _arith_patches(backend)
    print(f"backend={backend}  arith patchset={len(patches[0])} entries")

    fns = {
        "take_big": lambda m: lut_take_big(m, table_d),
        "take_bp": lambda m: lut_take_bp(m, ext_d),
        "mxu_bp": lambda m: lut_mxu_bp(m, planes_d),
        "arith_bp": lambda m: lut_arith_bp(m, patches),
    }

    # exhaustive exactness on this backend
    m_all = jnp.asarray(np.arange(32768, 65536, dtype=np.uint32))
    want = table_h[32768:65536].astype(np.int32)
    for name, fn in fns.items():
        got = np.asarray(jax.jit(fn)(m_all))
        bad = int((got != want).sum())
        print(f"{name:9s} exhaustive exactness: {bad} mismatches")
        assert bad == 0, name

    rng = np.random.default_rng(0)
    for p in args.sizes:
        m = jnp.asarray(
            rng.integers(32768, 65536, size=p, dtype=np.int64).astype(
                np.uint32
            )
        )
        print(f"\nP = {p}")
        for name, fn in fns.items():
            jf = jax.jit(fn)
            jf(m).block_until_ready()
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jf(m).block_until_ready()
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            print(
                f"  {name:9s} {best * 1e3:8.3f} ms   "
                f"{best / p * 1e9:6.3f} ns/elt"
            )


if __name__ == "__main__":
    main()
