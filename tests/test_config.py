"""FrameworkConfig: every field drives behavior (VERDICT r3 item 7).

The reference splits configuration across config.yml, compile-time #if
flags, and CMake options (SURVEY.md §5); here one frozen dataclass feeds
eval-key preparation, gate rotation impl, mesh construction, profiling,
and the bench default batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eoc_tfhe_tpu.config import (DEFAULT_CONFIG, EVAL_KEY_FORM_CHOICES,
                                 FrameworkConfig)
from eoc_tfhe_tpu.core import gates, keys
from eoc_tfhe_tpu.core.params import test_params as make_test_params


@pytest.fixture(scope="module")
def keyset():
    return keys.new_random_gate_bootstrapping_secret_keyset(
        jax.random.key(0), make_test_params())


def test_eval_key_form_dispatch(keyset):
    p = make_test_params()
    forms = {
        "rows": "rows",
        "fused": "compact",
        "ntt": ("ntt_scan", "ntt_kernel"),
        "ntt_rounded": ("ntt_scan", "ntt_kernel"),
    }
    for form, expect in forms.items():
        cfg = FrameworkConfig(param_set="test", eval_key_form=form)
        ek = cfg.prepare_eval_key(keyset.cloud, p)
        if isinstance(expect, tuple):
            assert ek.form in expect
        else:
            assert ek.form == expect
    # "ntt_rounded" means "rounded IF the coherent noise model accepts it";
    # since the r5 retraction it falls back to the exact plan at every
    # shipped parameter set (ROOFLINE.md "rounded plan retraction")
    ek_r = FrameworkConfig(param_set="test", eval_key_form="ntt_rounded") \
        .prepare_eval_key(keyset.cloud, p)
    assert ek_r.ntt_ctx.key_round_bits == 0
    ek_e = FrameworkConfig(param_set="test", eval_key_form="ntt") \
        .prepare_eval_key(keyset.cloud, p)
    assert ek_e.ntt_ctx.key_round_bits == 0


def test_invalid_choices_rejected():
    with pytest.raises(ValueError):
        FrameworkConfig(eval_key_form="chunked")   # stale pre-r4 name
    with pytest.raises(ValueError):
        FrameworkConfig(rotation_impl="warp")


def test_gate_api_binds_config(keyset):
    p = make_test_params()
    cfg = FrameworkConfig(param_set="test", eval_key_form="rows",
                          rotation_impl="gather")
    api = cfg.make_gate_api(keyset, p)
    a = np.array([0, 0, 1, 1], bool)
    b = np.array([0, 1, 0, 1], bool)
    ca = gates.encrypt_bit(jax.random.key(1), jnp.asarray(a), keyset.lwe_key, p)
    cb = gates.encrypt_bit(jax.random.key(2), jnp.asarray(b), keyset.lwe_key, p)
    got = gates.decrypt_bit(api.nand(ca, cb), keyset.lwe_key)
    np.testing.assert_array_equal(np.asarray(got), ~(a & b))
    # a config change changes behavior: rows vs fused eval key form
    assert api.eval_key.form == "rows"
    api2 = FrameworkConfig(param_set="test", eval_key_form="fused") \
        .make_gate_api(keyset, p)
    assert api2.eval_key.form == "compact"


def test_mesh_from_config():
    cfg = FrameworkConfig(mesh_dp=0, mesh_tp=2)
    mesh = cfg.make_mesh(devices=jax.devices()[:4])
    assert mesh.shape["dp"] == 2 and mesh.shape["tp"] == 2


def test_profile_echo_applied(capsys):
    from eoc_tfhe_tpu.utils.profiling import PROFILER
    FrameworkConfig(profile_echo=True).apply_profiling()
    try:
        assert PROFILER.echo is True
    finally:
        FrameworkConfig(profile_echo=False).apply_profiling()
    assert PROFILER.echo is False


def test_bench_default_batch_comes_from_config():
    import re
    src = open("bench.py").read()
    assert "DEFAULT_CONFIG.batch_size" in src
    assert DEFAULT_CONFIG.batch_size == 8192


def test_roundtrip_json():
    cfg = FrameworkConfig(param_set="80", eval_key_form="ntt_rounded",
                          mesh_tp=4, batch_size=512, profile_echo=True)
    assert FrameworkConfig.from_json(cfg.to_json()) == cfg


def test_serving_fields_consumed():
    """serving_* fields actually configure the GateServer (consumer-map
    discipline: every config field changes real behavior)."""
    import jax
    from eoc_tfhe_tpu.core import bootstrap, keys
    from eoc_tfhe_tpu.core.params import test_params
    p = test_params()
    ks = keys.new_random_gate_bootstrapping_secret_keyset(jax.random.key(1), p)
    ek = bootstrap.prepare_eval_key(ks.cloud)
    cfg = FrameworkConfig(param_set="test", serving_max_batch=7,
                          serving_max_delay_s=1.25, serving_pipeline_chunk=3)
    srv = cfg.make_gate_server(ek, p)
    try:
        assert srv.max_batch == 7
        assert srv.max_delay_s == 1.25
        assert srv.pipeline_chunk == 3
        # overrides win
        srv2 = cfg.make_gate_server(ek, p, max_batch=9)
        assert srv2.max_batch == 9 and srv2.pipeline_chunk == 3
        srv2.stop()
    finally:
        srv.stop()
