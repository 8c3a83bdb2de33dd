"""Fused integer Pallas VIF cascade vs the bit-exact XLA twin.

ops/pallas_vif_int.py re-runs the exact uint32 Q-schedule of
ops/vif_int.py inside one VMEM-resident kernel per scale; the only allowed
deviations are f32 reduction reassociation (per-tile partial sums) and the
documented motion hi/lo recombination. These tests pin the Pallas cascade
(interpret mode on the CPU mesh; the real-chip delta is asserted by
bench.py's parity check) against the XLA twin.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from pqa2_tpu.ops.motion_int import blur_int_batched, sad_pairs_int
from pqa2_tpu.ops.pallas_vif_int import vif_features_int_pallas
from pqa2_tpu.ops.vif_int import vif_features_int_batched

TOL = 2e-6  # f32 reassociation (fast statistic / ADM partial sums)


def _pair(rng, n, h, w, spread=40):
    ref = rng.integers(0, 256, (n, h, w)).astype(np.float32)
    dist = np.clip(
        ref + rng.integers(-spread, spread + 1, (n, h, w)), 0, 255
    ).astype(np.float32)
    return jnp.asarray(ref), jnp.asarray(dist)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 64, 128),  # tw=256: LUT chunk straddles the den/num boundary
        (3, 72, 96),   # scale-3 tw=128: single short straddling chunk
        (2, 57, 100),
        # tw=512 -> nlan = 16*512 = 8192 in interpret mode: the pure-den
        # chunk ends EXACTLY at the den/num boundary (c0 + wc == nlan) and
        # the later chunks are pure num — the two non-straddle branches of
        # _fused_exact_slots' chunked LUT fetch, unreachable at tw<=256.
        (1, 24, 300),
    ],
)
def test_vif_matches_xla_twin(rng, shape):
    """Default = exact fused statistic: BIT-identical to the XLA twin
    (integer accumulators + the gather-free breakpoint LUT scheme leave
    no reassociation freedom)."""
    r, d = _pair(rng, *shape)
    want = np.asarray(vif_features_int_batched(r, d))
    got = np.asarray(vif_features_int_pallas(r, d, interpret=True))
    assert np.array_equal(got, want)


def test_vif_gain_limit_neg(rng):
    """NEG clamp (vif_enhn_gain_limit=1.0) must match the twin exactly —
    enhancement regions take the clamped branch."""
    r, d = _pair(rng, 2, 64, 96, spread=60)
    want = np.asarray(vif_features_int_batched(r, d, gain_limit=1.0))
    got = np.asarray(vif_features_int_pallas(r, d, gain_limit=1.0,
                                             interpret=True))
    assert np.array_equal(got, want)


def test_vif_exact_hybrid_matches_fused(rng):
    """The sigma-plane hybrid (kernel emits planes, XLA runs the take-
    based statistic) and the fully-fused breakpoint statistic are the
    same exact computation — bit for bit."""
    r, d = _pair(rng, 2, 64, 128)
    fused = np.asarray(vif_features_int_pallas(r, d, interpret=True))
    hybrid = np.asarray(
        vif_features_int_pallas(r, d, interpret=True, exact_impl="hybrid")
    )
    assert np.array_equal(fused, hybrid)


def test_vif_fast_statistic_close_to_twin(rng):
    """integer_fast (f32-log statistic) keeps the documented tolerance."""
    r, d = _pair(rng, 2, 64, 128)
    want = np.asarray(vif_features_int_batched(r, d, exact=False))
    got = np.asarray(vif_features_int_pallas(r, d, interpret=True,
                                             exact=False))
    np.testing.assert_allclose(got, want, atol=TOL, rtol=0)


def test_fused_motion_matches_twin(rng):
    r, d = _pair(rng, 4, 64, 96)
    _, sad = vif_features_int_pallas(r, d, with_motion=True, interpret=True)
    blurred = blur_int_batched(r)
    want = np.concatenate(
        [[0.0], np.asarray(sad_pairs_int(blurred[1:], blurred[:-1]))]
    )
    np.testing.assert_allclose(np.asarray(sad), want, atol=1e-5, rtol=1e-6)


def test_identity_gives_unity(rng):
    r, _ = _pair(rng, 2, 64, 96)
    vif = np.asarray(vif_features_int_pallas(r, r, interpret=True))
    # The exact LUT statistic gives identity = 1 +- ~1e-5, not exactly 1:
    # libvmaf's own num path computes trunc(g^2*s1) = s1 - 1 (the 1e-10
    # epsilon pulls g a hair under 1), so num and den mantissas differ by
    # one code and the Q11 table occasionally steps. Real libvmaf behaves
    # identically; the SVR clips the score to exactly 100 regardless
    # (tests/test_anchors.py::test_identity_clips_at_100).
    np.testing.assert_allclose(vif, 1.0, atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 64, 96), (1, 72, 100), (2, 57, 96)])
def test_adm_matches_xla_twin(rng, shape):
    """Round 5: the fixed-point tail's pooled digit sums are bit-equal
    kernel vs XLA twin, and the shared f32 combine makes adm2 itself
    bit-identical."""
    from pqa2_tpu.ops.adm_int import (
        adm_features_int_batched,
        adm_pooled_digit_sums_batched,
    )
    from pqa2_tpu.ops.pallas_adm_int import (
        adm_features_int_pallas,
        adm_pooled_digit_sums_pallas,
    )

    r, d = _pair(rng, *shape, spread=25)
    dx = np.asarray(adm_pooled_digit_sums_batched(r, d))
    dp = np.asarray(adm_pooled_digit_sums_pallas(r, d, interpret=True))
    assert np.array_equal(dx, dp)
    want = np.asarray(adm_features_int_batched(r, d))
    got = np.asarray(adm_features_int_pallas(r, d, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_adm_int16_level0_bound_worst_case(rng):
    """The level-0 approx band stores as int16 for <= 12-bit inputs
    (ops/pallas_adm_int.py out_i16): worst-case amplitudes — full-scale
    12-bit constants and checkerboards, which maximise the db2 L1 gain —
    must stay bit-equal to the XLA twin through the narrow store."""
    from pqa2_tpu.ops.adm_int import adm_pooled_digit_sums_batched
    from pqa2_tpu.ops.pallas_adm_int import adm_pooled_digit_sums_pallas

    h, w = 64, 128
    flat = np.full((h, w), 4095.75, np.float32)
    checker = np.where((np.add.outer(np.arange(h), np.arange(w)) & 1),
                       4095.75, 0.0).astype(np.float32)
    stripes = np.where((np.arange(w) // 2 % 2)[None, :].repeat(h, 0),
                       4095.75, 0.0).astype(np.float32)
    for ref_img, dist_img in ((flat, checker), (checker, stripes),
                              (stripes, flat)):
        r = (ref_img / 16.0)[None]  # 12-bit codes on the 8-bit scale
        d = (dist_img / 16.0)[None]
        dx = np.asarray(adm_pooled_digit_sums_batched(r, d, bit_depth=12))
        dp = np.asarray(adm_pooled_digit_sums_pallas(r, d, interpret=True,
                                                     bit_depth=12))
        assert np.array_equal(dx, dp)


def test_adm_gain_limit_neg(rng):
    from pqa2_tpu.ops.adm_int import adm_pooled_digit_sums_batched
    from pqa2_tpu.ops.pallas_adm_int import adm_pooled_digit_sums_pallas

    r, d = _pair(rng, 2, 64, 96, spread=60)
    want = np.asarray(adm_pooled_digit_sums_batched(r, d, gain_limit=1.0))
    got = np.asarray(adm_pooled_digit_sums_pallas(r, d, gain_limit=1.0,
                                                  interpret=True))
    assert np.array_equal(got, want)


def test_extract_features_integer_pallas_backend(rng):
    """extract_features_batched(precision='integer', backend='pallas')
    agrees with the XLA integer path (full feature dict incl. halo
    handling)."""
    from pqa2_tpu.pipeline.features import extract_features_batched

    r, d = _pair(rng, 5, 64, 96)
    xla = extract_features_batched(r, d, precision="integer", backend="xla",
                                   has_prev=True, has_next=True)
    pal = extract_features_batched(r, d, precision="integer",
                                   backend="pallas",
                                   has_prev=True, has_next=True)
    assert set(xla) == set(pal)
    for k in xla:
        np.testing.assert_allclose(
            np.asarray(pal[k]), np.asarray(xla[k]), atol=5e-6, rtol=1e-6,
            err_msg=k,
        )


def test_exact_fused_bound_geometry():
    """The fused exact statistic only runs inside its proven-exact
    envelope (<= _exact_fused_max_tiles(...) tiles/frame, < 2^24 px);
    larger frames fall back to the equally-exact emit_sigma hybrid."""
    from pqa2_tpu.ops.pallas_vif_int import (
        DEFAULT_TILE_H,
        _exact_fused_in_bounds,
        _exact_fused_max_tiles,
    )

    # Strict worst-case cross-tile piece bounds (see _recombine_exact).
    assert _exact_fused_max_tiles(64, 512) == 511
    assert _exact_fused_max_tiles(128, 512) == 255
    for th in (DEFAULT_TILE_H, 2 * DEFAULT_TILE_H):  # 64 and the on-chip 128
        for h, w in ((1080, 1920), (2160, 3840), (2160, 4096)):
            assert _exact_fused_in_bounds(h, w, th, True)
            assert _exact_fused_in_bounds(h, w, th, False)
        # 4096x4096: over the tile cap AND 2^24 pixels — crosses the
        # envelope at either tile height.
        assert not _exact_fused_in_bounds(4096, 4096, th, True)


def test_exact_fused_fallback_scores_out_of_envelope(rng):
    """Actually SCORE a geometry outside the envelope and pin the result
    through the fallback (round-4 VERDICT item 8).

    4096x4096 = 2^24 px crosses both envelope bounds at scale 0 (the
    interpret-mode 16-row tiles put it over the tile cap too), so
    vif_features_int_pallas takes the per-scale emit_sigma hybrid branch
    there while scales 1-3 (<= 4M px) stay fused.  The mixed run must be
    bit-identical to the XLA twin — whose integer accumulators leave no
    reassociation freedom and which is itself pinned to the uint64 oracle
    in tests/test_integer.py — so the geometry-triggered switch can never
    silently change a score."""
    from pqa2_tpu.ops.pallas_vif_int import _exact_fused_in_bounds

    h = w = 4096
    assert not _exact_fused_in_bounds(h, w, 16, True)   # scale 0: fallback
    assert _exact_fused_in_bounds(h // 2, w // 2, 16, True)  # scale 1: fused
    ref = rng.integers(0, 256, (1, h, w)).astype(np.float32)
    dist = np.clip(
        ref + rng.integers(-24, 25, ref.shape).astype(np.float32), 0, 255)
    want = np.asarray(vif_features_int_batched(ref, dist))
    got = np.asarray(vif_features_int_pallas(ref, dist, interpret=True))
    assert np.array_equal(got, want), (got, want)


def test_log2_direct_audit_and_corrected_engine_exhaustive():
    """The in-kernel direct-log2 audit (log2_direct_exceptions) finds at
    most a tiny correction list on this backend, and the corrected direct
    engine — crlog2 sequence + the audited compare-adds, exactly as
    _fused_exact_slots applies them — reproduces the golden Q11 table on
    ALL 32768 mantissas."""
    import jax
    from jax.experimental import pallas as pl

    import pqa2_tpu.ops.pallas_vif_int as pv
    from pqa2_tpu.golden.log2lut import log2_table

    exc = pv.log2_direct_exceptions(True)
    assert exc is not None
    assert len(exc) <= pv._LOG2_DIRECT_MAX_EXC
    # The tiered audit must pick the light sequence on this backend's
    # interpret path (IEEE f32: 2 exceptions, within budget) — the engine
    # fn below is whatever it picked, so the pin holds regardless.
    engine = pv.log2_direct_engine_fn(True)

    def kernel(m_ref, o_ref):
        u = engine(m_ref[...])
        for m_e, d_e in exc:
            u = u + jnp.where(m_ref[...] == np.float32(m_e),
                              np.float32(d_e), np.float32(0.0))
        o_ref[...] = u.astype(jnp.int32)

    m_host = (32768.0 + np.arange(32768.0)).reshape(256, 128)
    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        interpret=True,
    )(jnp.asarray(m_host, jnp.float32))
    want = log2_table().astype(np.int64)[32768:65536] - 30720
    np.testing.assert_array_equal(
        np.asarray(got).reshape(-1).astype(np.int64), want)


def test_vif_exact_engines_bit_identical(rng):
    """Both exact-statistic engines — direct double-f32 table values and
    the MXU breakpoint fetch — produce features BIT-identical to the XLA
    twin (and hence to each other) regardless of the backend audit."""
    import pqa2_tpu.ops.pallas_vif_int as pv

    ref, dist = _pair(rng, 2, 64, 128)
    want = np.asarray(vif_features_int_batched(
        ref.astype(jnp.uint32), dist.astype(jnp.uint32)))
    import jax
    key = (jax.default_backend(), True)
    real = pv.log2_direct_exceptions(True)
    try:
        for forced in (real, None):
            pv._LOG2_DIRECT_EXC[key] = forced
            got = np.asarray(pv.vif_features_int_pallas(ref, dist,
                                                        exact=True))
            assert np.array_equal(got, want), (
                f"engine={'direct' if forced is not None else 'fetch'}")
    finally:
        pv._LOG2_DIRECT_EXC[key] = real
