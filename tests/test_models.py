"""Model-loader tests: parse all packaged models and assert the parameters
documented in SURVEY.md section 2.2 (from the reference's models/*.json)."""

import numpy as np
import pytest

from pqa2_tpu.models import available_models, get_model
from pqa2_tpu.models.loader import (
    CANONICAL_FEATURES,
    BootstrapModel,
    VMAFModel,
)


pytestmark = pytest.mark.smoke  # fast tier (run_tests.py --quick)


def test_registry_lists_all_models():
    names = available_models()
    for expected in [
        "vmaf_v0.6.1",
        "vmaf_v0.6.1neg",
        "vmaf_4k_v0.6.1",
        "vmaf_b_v0.6.3",
        "vmaf_float_v0.6.1",
    ]:
        assert expected in names


def test_hd_model_parameters():
    m = get_model("vmaf_v0.6.1")
    assert isinstance(m, VMAFModel)
    assert m.feature_names == CANONICAL_FEATURES
    assert m.n_sv == 211
    assert m.gamma == pytest.approx(0.04)
    assert m.rho == pytest.approx(-1.33133)
    assert m.sv.shape == (211, 6)
    assert m.slopes.shape == (7,)
    assert m.score_clip == (0.0, 100.0)
    st = m.score_transform
    assert st is not None and st.out_gte_in
    assert st.p0 == pytest.approx(1.70674692)
    assert st.p1 == pytest.approx(1.72643844)
    assert st.p2 == pytest.approx(-0.00705305)
    assert m.uses_integer_features
    # SV feature values live in the normalised [~0, ~1] space.
    assert np.all(m.sv <= 1.5) and np.all(m.sv >= -0.5)


def test_neg_model_gain_limits():
    m = get_model("vmaf_v0.6.1neg")
    assert m.feature_opt("adm2", "adm_enhn_gain_limit", None) == 1.0
    for s in range(4):
        assert m.feature_opt(f"vif_scale{s}", "vif_enhn_gain_limit", None) == 1.0
    # Plain model has no limits.
    plain = get_model("vmaf_v0.6.1")
    assert plain.feature_opt("adm2", "adm_enhn_gain_limit", 100.0) == 100.0


def test_4k_model():
    m = get_model("vmaf_4k_v0.6.1")
    assert m.n_sv == 262
    assert m.rho == pytest.approx(-2.30449)
    assert m.score_transform is None


def test_bootstrap_model():
    b = get_model("vmaf_b_v0.6.3")
    assert isinstance(b, BootstrapModel)
    assert b.n_models == 21
    for sub in b.models:
        assert sub.sv.shape[1] == 6
        assert 205 <= sub.n_sv <= 220
    assert b.models[0].rho == pytest.approx(-1.38271)


def test_npz_roundtrip_matches_json_parse():
    from pqa2_tpu.models.loader import load_model

    j = load_model("/root/reference/models/vmaf_v0.6.1.json", name="vmaf_v0.6.1")
    n = get_model("vmaf_v0.6.1")
    np.testing.assert_array_equal(j.sv, n.sv)
    np.testing.assert_array_equal(j.sv_coef, n.sv_coef)
    np.testing.assert_array_equal(j.slopes, n.slopes)
    np.testing.assert_array_equal(j.intercepts, n.intercepts)
    assert j.gamma == n.gamma and j.rho == n.rho


def test_user_model_directory(tmp_path):
    """Custom model JSONs discoverable via extra_dir (reference models/ scan)."""
    import json as _json
    import shutil

    from pqa2_tpu.models.registry import available_models, get_model

    # Copy a real libvmaf JSON from the reference as a "user model".
    src = "/root/reference/models/vmaf_v0.6.1.json"
    user_dir = str(tmp_path / "user_models")
    import os as _os
    _os.makedirs(user_dir)
    shutil.copy(src, _os.path.join(user_dir, "my_custom.json"))

    names = available_models(extra_dir=user_dir)
    assert "my_custom" in names and "vmaf_v0.6.1" in names
    model = get_model("my_custom", extra_dir=user_dir)
    assert model.n_sv == 211
    assert model.feature_names[0] == "adm2"


def test_user_models_dir_setting(tmp_path):
    """set_user_models_dir applies process-wide where no extra_dir is passed
    (the GUI's paths.models_dir setting / CLI --models-dir)."""
    import shutil

    from pqa2_tpu.models import registry

    user_dir = tmp_path / "user_models"
    user_dir.mkdir()
    shutil.copy("/root/reference/models/vmaf_v0.6.1.json",
                str(user_dir / "site_model.json"))

    registry.set_user_models_dir(str(user_dir))
    try:
        assert "site_model" in registry.available_models()
        model = registry.get_model("site_model")
        assert model.n_sv == 211
        # Explicit extra_dir still wins over the global.
        assert "site_model" not in registry.available_models(extra_dir="")
    finally:
        registry.set_user_models_dir(None)
    assert "site_model" not in registry.available_models()
