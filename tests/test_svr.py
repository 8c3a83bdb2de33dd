"""Score-fusion tests: the JAX predictor against a direct float64 numpy
evaluation of the libsvm nu-SVR chain."""

import numpy as np
import pytest

from pqa2_tpu.models import get_model
from pqa2_tpu.models.loader import BootstrapModel
from pqa2_tpu.models.svr import BootstrapPredictor, ScorePredictor


pytestmark = pytest.mark.smoke  # fast tier (run_tests.py --quick)


def numpy_predict(model, features):
    """Direct float64 reference of the prediction chain."""
    x = features * model.slopes[1:] + model.intercepts[1:]
    d2 = ((x[:, None, :] - model.sv[None, :, :]) ** 2).sum(-1)
    raw = np.exp(-model.gamma * d2) @ model.sv_coef - model.rho
    score = (raw - model.intercepts[0]) / model.slopes[0]
    if model.score_transform is not None:
        st = model.score_transform
        y = st.p0 + st.p1 * score + st.p2 * score * score
        score = np.maximum(y, score) if st.out_gte_in else y
    if model.score_clip:
        score = np.clip(score, *model.score_clip)
    return score


@pytest.mark.parametrize("name", ["vmaf_v0.6.1", "vmaf_4k_v0.6.1", "vmaf_v0.6.1neg"])
def test_predictor_matches_numpy(name, rng):
    model = get_model(name)
    # Realistic feature ranges: adm2/vif in [0,1], motion2 in [0,30].
    feats = np.stack(
        [
            rng.uniform(0.3, 1.0, 64),
            rng.uniform(0.0, 25.0, 64),
            rng.uniform(0.1, 1.0, 64),
            rng.uniform(0.3, 1.0, 64),
            rng.uniform(0.5, 1.0, 64),
            rng.uniform(0.6, 1.0, 64),
        ],
        axis=1,
    )
    expected = numpy_predict(model, feats)
    got = np.asarray(ScorePredictor(model)(feats.astype(np.float32)))
    # f32 device math vs f64 reference on a 0-100 scale.
    np.testing.assert_allclose(got, expected, atol=5e-3)


def test_perfect_features_score_high():
    model = get_model("vmaf_v0.6.1")
    # adm2=1, motion2=0, vif*=1 — a pristine still pair.
    feats = np.array([[1.0, 0.0, 1.0, 1.0, 1.0, 1.0]])
    score = float(ScorePredictor(model)(feats.astype(np.float32))[0])
    assert score > 95.0
    assert score <= 100.0


def test_bootstrap_predictor(rng):
    b = get_model("vmaf_b_v0.6.3")
    assert isinstance(b, BootstrapModel)
    feats = np.array([[1.0, 0.0, 1.0, 1.0, 1.0, 1.0], [0.5, 10.0, 0.5, 0.6, 0.7, 0.8]])
    primary, all_scores = BootstrapPredictor(b)(feats.astype(np.float32))
    assert all_scores.shape == (21, 2)
    # Primary prediction equals sub-model 0 evaluated standalone.
    solo = ScorePredictor(b.models[0])(feats.astype(np.float32))
    np.testing.assert_allclose(np.asarray(primary), np.asarray(solo), atol=1e-5)
    # Ensemble members agree within a few VMAF points on clean input.
    assert float(np.std(np.asarray(all_scores)[:, 0])) < 5.0
