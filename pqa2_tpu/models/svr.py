"""nu-SVR RBF score fusion, as a batched JAX computation.

libvmaf evaluates the SVR per frame inside its C prediction loop
(model JSON ``model_dict.model`` consumed via ffmpeg's libvmaf filter,
reference: app/vmaf_analyzer.py:372-419). Here the whole clip is fused in one
batched program:

  features (N, F) --linear_rescale--> x
  kernel  K = exp(-gamma * ||x - sv||^2)        # (N, n_sv) via one matmul
  raw     = K @ coef - rho                       # MXU-friendly dot
  score   = inverse rescale -> score_transform polynomial -> clip

Prediction chain order follows the libvmaf/vmaf-python semantics implied by
the model files (norm_type=linear_rescale, score_transform with out_gte_in,
score_clip=[0,100]; see SURVEY.md section 2.2).

Bootstrap models (21 sub-models) are evaluated as one stacked vmap: the
per-sub-model SV counts are zero-padded to a common n_sv so the whole ensemble
is a single (M, n_sv, F) tensor contraction — mean score + CI come out of one
device program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from pqa2_tpu.models.loader import BootstrapModel, VMAFModel


def _predict_core(x, sv, coef, gamma, rho):
    """RBF nu-SVR decision values for a batch of normalised feature rows.

    x: (N, F); sv: (n_sv, F); coef: (n_sv,). Returns (N,).

    Squared distances use the direct (x - sv)^2 difference, NOT the
    |x|^2 + |sv|^2 - 2 x.sv matmul expansion: the expansion cancels
    catastrophically in f32 for near-duplicate vectors, and the inverse
    rescale (1/slopes[0] ~ 83x) amplifies that straight through the 0.01
    score-parity budget (measured: 0.022 vs 0.0014 max error). With F=6 the
    broadcasted difference is a trivial VPU op; the only matmul-shaped
    contraction left (K @ coef) runs at HIGHEST precision so TPU doesn't
    drop it to bf16 passes.
    """
    d2 = jnp.sum((x[:, None, :] - sv[None, :, :]) ** 2, axis=-1)  # (N, n_sv)
    k = jnp.exp(-gamma * d2)
    return jnp.dot(k, coef, precision=jax.lax.Precision.HIGHEST) - rho


@functools.partial(
    jax.jit,
    static_argnames=("score_transform", "score_clip"),
)
def predict_scores(
    features: jax.Array,
    *,
    sv: jax.Array,
    sv_coef: jax.Array,
    gamma: float,
    rho: float,
    slopes: jax.Array,
    intercepts: jax.Array,
    score_transform: Optional[Tuple[float, float, float, bool]],
    score_clip: Optional[Tuple[float, float]],
) -> jax.Array:
    """Full prediction chain for one model. features: (N, F) raw values."""
    x = features * slopes[1:][None, :] + intercepts[1:][None, :]
    raw = _predict_core(x, sv, sv_coef, gamma, rho)
    score = (raw - intercepts[0]) / slopes[0]
    if score_transform is not None:
        p0, p1, p2, out_gte_in = score_transform
        y = p0 + p1 * score + p2 * score * score
        score = jnp.maximum(y, score) if out_gte_in else y
    if score_clip is not None:
        score = jnp.clip(score, score_clip[0], score_clip[1])
    return score


class ScorePredictor:
    """Callable wrapper binding a VMAFModel's arrays into a jitted predictor."""

    def __init__(self, model: VMAFModel, dtype=jnp.float32):
        self.model = model
        self._sv = jnp.asarray(model.sv, dtype=dtype)
        self._coef = jnp.asarray(model.sv_coef, dtype=dtype)
        self._slopes = jnp.asarray(model.slopes, dtype=dtype)
        self._intercepts = jnp.asarray(model.intercepts, dtype=dtype)
        st = model.score_transform
        self._st = (st.p0, st.p1, st.p2, st.out_gte_in) if st else None
        self._clip = model.score_clip

    def __call__(self, features: jax.Array) -> jax.Array:
        return predict_scores(
            features,
            sv=self._sv,
            sv_coef=self._coef,
            gamma=self.model.gamma,
            rho=self.model.rho,
            slopes=self._slopes,
            intercepts=self._intercepts,
            score_transform=self._st,
            score_clip=self._clip,
        )


class BootstrapPredictor:
    """Stacked evaluation of a bootstrap ensemble.

    Returns (mean_score, scores_per_model) where scores_per_model is
    (n_models, N). Sub-model 0 is libvmaf's primary bootstrap prediction;
    the CI comes from the spread of models 1..n (see pipeline/scoring.py).
    """

    def __init__(self, bmodel: BootstrapModel, dtype=jnp.float32):
        self.model = bmodel
        n_sv_max = max(m.n_sv for m in bmodel.models)
        F = bmodel.models[0].n_features
        M = bmodel.n_models
        sv = np.zeros((M, n_sv_max, F), dtype=np.float64)
        coef = np.zeros((M, n_sv_max), dtype=np.float64)
        for i, m in enumerate(bmodel.models):
            sv[i, : m.n_sv] = m.sv
            coef[i, : m.n_sv] = m.sv_coef  # zero padding contributes exp()*0
        self._sv = jnp.asarray(sv, dtype=dtype)
        self._coef = jnp.asarray(coef, dtype=dtype)
        self._slopes = jnp.asarray(
            np.stack([m.slopes for m in bmodel.models]), dtype=dtype
        )
        self._intercepts = jnp.asarray(
            np.stack([m.intercepts for m in bmodel.models]), dtype=dtype
        )
        self._gamma = jnp.asarray([m.gamma for m in bmodel.models], dtype=dtype)
        self._rho = jnp.asarray([m.rho for m in bmodel.models], dtype=dtype)
        m0 = bmodel.models[0]
        st = m0.score_transform
        self._st = (st.p0, st.p1, st.p2, st.out_gte_in) if st else None
        self._clip = m0.score_clip

    def __call__(self, features: jax.Array):
        def one(sv, coef, gamma, rho, slopes, intercepts):
            return predict_scores(
                features,
                sv=sv,
                sv_coef=coef,
                gamma=gamma,
                rho=rho,
                slopes=slopes,
                intercepts=intercepts,
                score_transform=self._st,
                score_clip=self._clip,
            )

        scores = jax.vmap(one)(
            self._sv, self._coef, self._gamma, self._rho,
            self._slopes, self._intercepts,
        )  # (M, N)
        return scores[0], scores


@functools.lru_cache(maxsize=None)
def get_predictor(model_name: str):
    """Registry-name -> cached predictor (ScorePredictor or BootstrapPredictor)."""
    from pqa2_tpu.models.registry import get_model

    model = get_model(model_name)
    if isinstance(model, BootstrapModel):
        return BootstrapPredictor(model)
    return ScorePredictor(model)
