"""1-D Mamba block + language-model stack (the reference vendors this as
`mamba_ssm/` -- `modules/mamba_simple.py:119-353`,
`models/mixer_seq_simple.py`, `utils/generation.py`; the fusion model never
instantiates it, but it is part of the package's capability surface).

TPU-native layout: tokens on sublanes, channels on lanes -- the same
(B, K=1, L, D) selective-scan core as SS2D. Decode uses an explicit
(conv_state, ssm_state) cache with a single-token state update, the
`selective_state_update` equivalent (`ops/triton/selective_state_update.py:
21-155`) in plain jnp -- no custom kernel needed at batch-decode sizes.
"""
from __future__ import annotations

import functools
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.initializers import (
    a_log_s4d,
    dt_proj_bias,
    dt_proj_weight,
    torch_conv_bias,
    torch_conv_kernel,
)
from ..ops import selective_scan


class MambaBlock(nn.Module):
    """`Mamba` (`mamba_simple.py:119-294`): in_proj -> causal depthwise
    conv1d + SiLU -> x_proj -> (dt, B, C) -> selective scan -> z gate ->
    out_proj."""
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None
    scan_impl: str = "auto"

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def rank(self) -> int:
        return (math.ceil(self.d_model / 16)
                if self.dt_rank is None else self.dt_rank)

    @nn.compact
    def __call__(self, x, cache: dict | None = None):
        """x: (B, L, D). With `cache`, L must be 1 (decode step) and the
        updated cache is returned alongside the output."""
        B, L, _ = x.shape
        d_in = self.d_inner
        R = self.rank
        N = self.d_state

        xz = nn.Dense(2 * d_in, use_bias=False, name="in_proj")(x)
        xpart, z = jnp.split(xz, 2, axis=-1)

        conv_kernel = self.param(
            "conv1d_kernel", torch_conv_kernel(), (self.d_conv, 1, d_in))
        conv_bias = self.param(
            "conv1d_bias", torch_conv_bias(self.d_conv), (d_in,))

        x_proj = nn.Dense(R + 2 * N, use_bias=False, name="x_proj")
        dt_w = self.param("dt_proj_weight", dt_proj_weight(R), (d_in, R))
        dt_b = self.param("dt_proj_bias", dt_proj_bias(), (d_in,))
        A_log = self.param("A_log", a_log_s4d(N), (d_in, N))
        Dp = self.param("D", nn.initializers.ones, (d_in,))
        out_proj = nn.Dense(self.d_model, use_bias=False, name="out_proj")

        A = -jnp.exp(A_log.astype(jnp.float32))

        if cache is None:
            # causal depthwise conv over L
            xc = jax.lax.conv_general_dilated(
                xpart, conv_kernel,
                window_strides=(1,), padding=[(self.d_conv - 1, 0)],
                feature_group_count=d_in,
                dimension_numbers=("NHC", "HIO", "NHC")) + conv_bias
            xc = jax.nn.silu(xc)
            dbc = x_proj(xc)
            dt = jnp.einsum("blr,dr->bld", dbc[..., :R], dt_w)
            Bm = dbc[..., R:R + N]
            Cm = dbc[..., R + N:]
            y = selective_scan(
                xc[:, None].astype(jnp.float32),
                dt[:, None].astype(jnp.float32),
                A[None], Bm[:, None].astype(jnp.float32),
                Cm[:, None].astype(jnp.float32),
                Dp[None].astype(jnp.float32), dt_b[None].astype(jnp.float32),
                delta_softplus=True, impl=self.scan_impl)[:, 0]
            y = y.astype(x.dtype) * jax.nn.silu(z)
            return out_proj(y), None

        # ---- single-token decode (`mamba_simple.py:208-253`) ----
        conv_state = cache["conv_state"]        # (B, d_conv, d_in)
        ssm_state = cache["ssm_state"]          # (B, d_in, N)
        xt = xpart[:, 0]                        # (B, d_in)
        conv_state = jnp.concatenate(
            [conv_state[:, 1:], xt[:, None]], axis=1)
        xc = jnp.sum(conv_state * conv_kernel[:, 0][None], axis=1) + conv_bias
        xc = jax.nn.silu(xc)
        dbc = x_proj(xc)
        dt = jax.nn.softplus(dbc[..., :R] @ dt_w.T + dt_b)
        Bm = dbc[..., R:R + N]
        Cm = dbc[..., R + N:]
        dA = jnp.exp(dt[..., None] * A[None])           # (B, d_in, N)
        dBx = (dt * xc)[..., None] * Bm[:, None, :]
        ssm_state = ssm_state * dA + dBx
        y = jnp.einsum("bdn,bn->bd", ssm_state, Cm) + Dp * xc
        y = y * jax.nn.silu(z[:, 0])
        out = out_proj(y)[:, None]
        return out, {"conv_state": conv_state, "ssm_state": ssm_state}

    def init_cache(self, batch: int, dtype=jnp.float32) -> dict:
        return make_cache(batch, self.d_inner, self.d_state, self.d_conv,
                          dtype)


def make_cache(batch: int, d_inner: int, d_state: int, d_conv: int = 4,
               dtype=jnp.float32) -> dict:
    return {
        "conv_state": jnp.zeros((batch, d_conv, d_inner), dtype),
        "ssm_state": jnp.zeros((batch, d_inner, d_state), dtype),
    }


class ResidualBlock(nn.Module):
    """Prenorm block (`mamba_simple.py:297-353`). `rms_norm` selects the
    RMSNorm flavor the released Mamba checkpoints use
    (`models/config_mamba.py` rms_norm=True default)."""
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None
    scan_impl: str = "auto"
    norm_eps: float = 1e-5
    rms_norm: bool = False

    @nn.compact
    def __call__(self, x, cache=None):
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        h = norm_cls(epsilon=self.norm_eps, name="norm")(x)
        h, cache = MambaBlock(self.d_model, d_state=self.d_state,
                              d_conv=self.d_conv, expand=self.expand,
                              dt_rank=self.dt_rank,
                              scan_impl=self.scan_impl, name="mixer")(
            h, cache)
        return x + h, cache


class MambaLMHeadModel(nn.Module):
    """`MambaLMHeadModel` (`models/mixer_seq_simple.py`): embedding ->
    n_layer prenorm Mamba blocks -> final norm -> tied LM head."""
    vocab_size: int
    d_model: int = 768
    n_layer: int = 24
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None
    scan_impl: str = "auto"
    norm_eps: float = 1e-5
    rms_norm: bool = False

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.d_model)
        self.blocks = [
            ResidualBlock(self.d_model, d_state=self.d_state,
                          d_conv=self.d_conv, expand=self.expand,
                          dt_rank=self.dt_rank,
                          scan_impl=self.scan_impl, rms_norm=self.rms_norm)
            for _ in range(self.n_layer)
        ]
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        self.norm_f = norm_cls(epsilon=self.norm_eps)

    def __call__(self, tokens, caches=None):
        """tokens: (B, L) int32. Returns (logits, caches)."""
        x = self.embedding(tokens)
        new_caches = []
        for i, block in enumerate(self.blocks):
            x, c = block(x, None if caches is None else caches[i])
            new_caches.append(c)
        x = self.norm_f(x)
        logits = self.embedding.attend(x)  # tied head
        return logits, (new_caches if caches is not None else None)

    def init_caches(self, batch: int) -> list[dict]:
        return [
            make_cache(batch, self.expand * self.d_model, self.d_state,
                       self.d_conv)
            for _ in range(self.n_layer)
        ]


def top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Mask logits outside the top-p nucleus to -inf
    (`utils/generation.py:53-68`: sort ascending, drop tokens whose
    cumulative softmax is <= 1 - top_p)."""
    if top_p <= 0.0 or top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)          # ascending
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    keep = cum > (1.0 - top_p)
    min_keep = jnp.min(jnp.where(keep, sorted_logits, jnp.inf),
                       axis=-1, keepdims=True)
    return jnp.where(logits < min_keep, -jnp.inf, logits)


def min_p_filter(logits: jax.Array, min_p: float) -> jax.Array:
    """Drop tokens whose probability is below min_p * max-probability
    (`utils/generation.py:37-42` intent; the reference's in-place variant
    compares raw logits against min_p, which only works for pre-normalized
    inputs -- this implements the documented min-p semantics)."""
    if min_p <= 0.0 or min_p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    thresh = min_p * jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < thresh, -jnp.inf, logits)


def seen_mask(prev_tokens: jax.Array, vocab_size: int) -> jax.Array:
    """(B, S) token history -> (B, V) bool membership mask. Generation
    carries this fixed-size mask and scatter-updates it per emitted token
    instead of re-one-hotting a growing (B, S, V) history every step."""
    B = prev_tokens.shape[0]
    mask = jnp.zeros((B, vocab_size), jnp.bool_)
    return mask.at[jnp.arange(B)[:, None], prev_tokens].set(True)


def apply_repetition_penalty_mask(logits: jax.Array, seen: jax.Array,
                                  penalty: float) -> jax.Array:
    """CTRL-style repetition penalty against a (B, V) seen-mask
    (`utils/generation.py:71-84`): negative logits are multiplied by the
    penalty, positive ones divided."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, penalized, logits)


def apply_repetition_penalty(logits: jax.Array, prev_tokens: jax.Array,
                             penalty: float) -> jax.Array:
    """Token-history flavor of `apply_repetition_penalty_mask`: logits
    (B, V), prev_tokens (B, S)."""
    if penalty == 1.0:
        return logits
    return apply_repetition_penalty_mask(
        logits, seen_mask(prev_tokens, logits.shape[-1]), penalty)


def sample_logits(logits: jax.Array, rng: jax.Array, temperature: float = 1.0,
                  top_k: int = 0, top_p: float = 0.0,
                  min_p: float = 0.0) -> jax.Array:
    """One sampling step over (B, V) logits, mirroring the reference
    `sample` (`utils/generation.py:87-133`): top_k == 1 short-circuits to
    greedy; top_k > 0 restricts to the k best then applies temperature and
    top-p; top_k == 0 applies min-p or top-p on the full vocabulary."""
    if top_k == 1 or temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    if top_k > 0:
        k = min(top_k, logits.shape[-1])
        kth = jnp.sort(logits, axis=-1)[:, -k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
        if temperature != 1.0:
            logits = logits / temperature
        logits = top_p_filter(logits, top_p)
        return jax.random.categorical(rng, logits)
    if min_p > 0.0:
        logits = min_p_filter(logits, min_p)
        if temperature != 1.0:
            logits = logits / temperature
        return jax.random.categorical(rng, logits)
    if temperature != 1.0:
        logits = logits / temperature
    logits = top_p_filter(logits, top_p)
    return jax.random.categorical(rng, logits)


def generate(model: MambaLMHeadModel, variables: Any, prompt: jax.Array,
             max_new_tokens: int, temperature: float = 1.0,
             top_k: int = 0, top_p: float = 0.0, min_p: float = 0.0,
             repetition_penalty: float = 1.0,
             rng: jax.Array | None = None,
             compiled: bool = True) -> jax.Array:
    """Autoregressive sampling with cached single-token steps
    (`utils/generation.py:121-242`; greedy when temperature == 0 or
    top_k == 1). The repetition penalty is applied against ALL tokens
    emitted so far including the prompt (`generation.py:222-228`,
    `sequences_cat`).

    `compiled=True` (default) runs the whole decode as ONE jitted
    `lax.scan` program -- the TPU analog of the reference's CUDA-graph
    captured decode (`utils/generation.py:269-379`): one dispatch instead
    of one per token. `compiled=False` keeps the per-token Python loop
    (the golden model for the parity test)."""
    if prompt.ndim != 2 or prompt.shape[1] < 1:
        raise ValueError(
            f"prompt must be (B, S>=1) int tokens, got shape {prompt.shape}")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if compiled:
        fn = _compiled_generate_fn(
            model, max_new_tokens, prompt.shape[1], float(temperature),
            int(top_k), float(top_p), float(min_p),
            float(repetition_penalty))
        return fn(variables, prompt, rng)

    B = prompt.shape[0]
    caches = model.init_caches(B)
    # prefill one token at a time (simple; prompt lengths are small for this
    # capability's use)
    for i in range(prompt.shape[1]):
        logits, caches = model.apply(variables, prompt[:, i:i + 1], caches)
    out = [prompt]
    vocab = logits.shape[-1]
    seen = seen_mask(prompt, vocab)
    last_logits = logits[:, -1]
    for step in range(max_new_tokens):
        stepped = apply_repetition_penalty_mask(last_logits, seen,
                                                repetition_penalty)
        rng, sub = jax.random.split(rng)
        tok = sample_logits(stepped, sub, temperature=temperature,
                            top_k=top_k, top_p=top_p, min_p=min_p)[:, None]
        out.append(tok)
        if repetition_penalty != 1.0:
            seen = seen.at[jnp.arange(B), tok[:, 0]].set(True)
        logits, caches = model.apply(variables, tok, caches)
        last_logits = logits[:, -1]
    return jnp.concatenate(out, axis=1)


@functools.cache
def _compiled_generate_fn(model: MambaLMHeadModel, max_new_tokens: int,
                          prompt_len: int, temperature: float, top_k: int,
                          top_p: float, min_p: float,
                          repetition_penalty: float):
    """One jitted program for prefill + decode: `lax.scan` over the prompt
    (single-token cached steps, identical math to the Python loop), then
    `lax.scan` over `max_new_tokens` decode steps threading
    (logits, caches, seen, rng) as the carry. Cached per (model, static
    sampling config) -- repeat calls reuse the compiled executable, the
    TPU analog of reusing a captured CUDA graph."""
    track_seen = repetition_penalty != 1.0

    def run(variables, prompt, rng):
        B = prompt.shape[0]
        caches = model.init_caches(B)

        def prefill_step(caches, tok):
            logits, caches = model.apply(variables, tok[:, None], caches)
            return caches, logits[:, 0]

        caches, all_logits = jax.lax.scan(
            prefill_step, caches, jnp.swapaxes(prompt, 0, 1))
        last_logits = all_logits[-1]
        vocab = last_logits.shape[-1]
        seen = (seen_mask(prompt, vocab) if track_seen
                else jnp.zeros((B, 1), jnp.bool_))

        def decode_step(carry, _):
            last_logits, caches, seen, rng = carry
            stepped = (apply_repetition_penalty_mask(
                last_logits, seen, repetition_penalty) if track_seen
                else last_logits)
            rng, sub = jax.random.split(rng)
            tok = sample_logits(stepped, sub, temperature=temperature,
                                top_k=top_k, top_p=top_p, min_p=min_p)
            if track_seen:
                seen = seen.at[jnp.arange(B), tok].set(True)
            logits, caches = model.apply(variables, tok[:, None], caches)
            return (logits[:, -1], caches, seen, rng), tok

        (_, _, _, _), toks = jax.lax.scan(
            decode_step, (last_logits, caches, seen, rng), None,
            length=max_new_tokens)
        return jnp.concatenate([prompt, jnp.swapaxes(toks, 0, 1)], axis=1)

    return jax.jit(run)
