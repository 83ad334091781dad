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
