"""Mamba LM stack: parallel-scan forward vs cached single-token decode must
agree (the reference validates its decode path the same way -- step() vs
full forward, `mamba_simple.py:185-253`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusionmamba_tpu.models.mamba_lm import MambaBlock, MambaLMHeadModel


def test_block_decode_matches_parallel():
    block = MambaBlock(d_model=16, d_state=4, scan_impl="assoc")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)
    y_par, _ = block.apply(variables, x)

    cache = block.init_cache(2)
    ys = []
    for i in range(x.shape[1]):
        y, cache = block.apply(variables, x[:, i:i + 1], cache)
        ys.append(y)
    y_seq = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_seq),
                               rtol=2e-3, atol=2e-3)


def test_lm_forward_and_generate():
    model = MambaLMHeadModel(vocab_size=32, d_model=16, n_layer=2,
                             d_state=4, scan_impl="assoc")
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    logits, _ = model.apply(variables, tokens)
    assert logits.shape == (1, 3, 32)

    from fusionmamba_tpu.models.mamba_lm import generate
    out = generate(model, variables, tokens, max_new_tokens=4,
                   temperature=0.0)
    assert out.shape == (1, 7)
    assert np.isfinite(np.asarray(logits)).all()


def test_top_p_and_min_p_filters():
    from fusionmamba_tpu.models.mamba_lm import min_p_filter, top_p_filter

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]], jnp.float32))
    # top_p = 0.75: keep 0.5 + 0.3 (cum from the smallest: 0.05, 0.2, 0.5
    # are all <= 0.25? no -- drop tokens whose ascending-cum <= 1 - 0.75)
    out = np.asarray(top_p_filter(logits, 0.75))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert out[0, 3] == -np.inf
    # min_p = 0.5: keep probs >= 0.5 * 0.5 = 0.25 -> tokens 0 and 1
    out = np.asarray(min_p_filter(logits, 0.5))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert out[0, 2] == -np.inf and out[0, 3] == -np.inf


def test_repetition_penalty_matches_reference_semantics():
    from fusionmamba_tpu.models.mamba_lm import apply_repetition_penalty

    logits = jnp.asarray([[2.0, -1.0, 0.5, 3.0]], jnp.float32)
    prev = jnp.asarray([[0, 1, 1]], jnp.int32)  # tokens 0 and 1 seen
    out = np.asarray(apply_repetition_penalty(logits, prev, 2.0))
    # positive seen logits divided, negative multiplied
    # (`utils/generation.py:71-84`)
    np.testing.assert_allclose(out, [[1.0, -2.0, 0.5, 3.0]])


def test_sample_logits_modes():
    from fusionmamba_tpu.models.mamba_lm import sample_logits

    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]], jnp.float32)
    rng = jax.random.PRNGKey(0)
    # top_k=1 short-circuits to greedy (`utils/generation.py:92-94`)
    assert int(sample_logits(logits, rng, temperature=9.0, top_k=1)[0]) == 1
    # top_k=2 + tiny temperature concentrates on the argmax
    toks = [int(sample_logits(logits, jax.random.PRNGKey(i),
                              temperature=0.01, top_k=2)[0])
            for i in range(8)]
    assert set(toks) == {1}
    # top_p tiny -> nucleus is the single best token even at temperature 1
    toks = [int(sample_logits(logits, jax.random.PRNGKey(i), top_p=0.01)[0])
            for i in range(8)]
    assert set(toks) == {1}


def test_generate_with_sampling_tail():
    model = MambaLMHeadModel(vocab_size=32, d_model=16, n_layer=2,
                             d_state=4, scan_impl="assoc")
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    from fusionmamba_tpu.models.mamba_lm import generate
    out = generate(model, variables, tokens, max_new_tokens=4,
                   temperature=0.8, top_k=0, top_p=0.9,
                   repetition_penalty=1.3, rng=jax.random.PRNGKey(1))
    assert out.shape == (1, 7)
    assert (np.asarray(out) < 32).all() and (np.asarray(out) >= 0).all()


def test_compiled_generate_matches_python_loop():
    """The lax.scan compiled decode (TPU analog of the reference's
    CUDA-graph capture, `utils/generation.py:269-379`) must be token-exact
    vs the per-token Python loop, greedy and sampled (same rng path)."""
    from fusionmamba_tpu.models.mamba_lm import generate

    model = MambaLMHeadModel(vocab_size=32, d_model=16, n_layer=2,
                             d_state=4, scan_impl="assoc")
    tokens = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)

    for kw in (dict(temperature=0.0),
               dict(temperature=0.8, top_k=4, repetition_penalty=1.3,
                    rng=jax.random.PRNGKey(7)),
               dict(temperature=1.0, top_p=0.9, rng=jax.random.PRNGKey(9))):
        a = generate(model, variables, tokens, max_new_tokens=5,
                     compiled=False, **kw)
        b = generate(model, variables, tokens, max_new_tokens=5,
                     compiled=True, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_rejects_empty_prompt():
    from fusionmamba_tpu.models.mamba_lm import generate

    model = MambaLMHeadModel(vocab_size=8, d_model=8, n_layer=1,
                             d_state=4, scan_impl="assoc")
    tokens = jnp.asarray([[1]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tokens)
    with pytest.raises(ValueError):
        generate(model, variables, jnp.zeros((1, 0), jnp.int32), 3)


def test_hf_import_round_trip():
    """export -> convert round-trips the full variables tree, and a
    converted checkpoint produces identical logits (RMSNorm flavor, like
    the released state-spaces/mamba-* checkpoints)."""
    from fusionmamba_tpu.checkpoints.hf_import import (
        convert_mamba_state_dict,
        export_mamba_state_dict,
        model_from_config,
    )

    model = MambaLMHeadModel(vocab_size=32, d_model=16, n_layer=2,
                             d_state=4, scan_impl="assoc", rms_norm=True)
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(42), tokens)
    sd = export_mamba_state_dict(variables, n_layer=2)
    assert "lm_head.weight" in sd  # tied head emitted for the torch side
    back = convert_mamba_state_dict(sd, n_layer=2)

    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    l0, _ = model.apply(variables, tokens)
    l1, _ = model.apply(back, tokens)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)

    # config.json -> model construction (vocab padding rule)
    m = model_from_config({"d_model": 16, "n_layer": 2, "vocab_size": 30,
                           "rms_norm": True, "pad_vocab_size_multiple": 8,
                           "ssm_cfg": {"d_state": 4}})
    assert m.vocab_size == 32 and m.rms_norm and m.d_state == 4


def test_model_from_config_honors_and_validates_ssm_cfg():
    from fusionmamba_tpu.checkpoints.hf_import import model_from_config

    m = model_from_config({"d_model": 16, "n_layer": 1, "vocab_size": 32,
                           "ssm_cfg": {"d_state": 8, "d_conv": 3,
                                       "expand": 3, "dt_rank": 5}})
    assert (m.d_state, m.d_conv, m.expand, m.dt_rank) == (8, 3, 3, 5)
    # a non-default ssm_cfg must build a block whose params convert cleanly
    tokens = jnp.asarray([[1, 2]], jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), tokens)
    p = variables["params"]["blocks_0"]["mixer"]
    assert p["conv1d_kernel"].shape[0] == 3          # d_conv honored
    assert p["in_proj"]["kernel"].shape == (16, 2 * 3 * 16)  # expand=3
    assert p["dt_proj_weight"].shape == (3 * 16, 5)  # dt_rank honored

    with pytest.raises(ValueError, match="ssm_cfg"):
        model_from_config({"d_model": 16, "n_layer": 1, "vocab_size": 32,
                           "ssm_cfg": {"layer": "Mamba2"}})
