"""T5 v1.1 text encoder in pure JAX — the frozen prompt encoder.

TPU-native replacement for the reference's torch T5-XXL
(`/root/reference/utils.py:83-110`: FLUX.1-dev `text_encoder_2` =
google/t5-v1_1-xxl, bf16, frozen). Architecture implemented from the public
T5 v1.1 design: RMS layer norm (no bias, no mean subtraction), relative
position bias computed once in block 0 and shared across layers, unscaled
attention (no 1/√d), gated-GELU feed-forward, final RMS norm.

`encode(...)` reproduces `encode_prompt_with_t5` semantics
(`utils.py:38-80`): fixed-length padded ids, **no attention mask** (the
reference never passes one, so pad tokens are attended — kept for parity),
returns `hidden_states[return_index]`; when return_index ≠ -1, the final
layer norm is re-applied on top of the intermediate state (`utils.py:62-69`;
its dropout is eval-mode → no-op).

Weights load from a torch T5 state dict via `convert_torch_t5` — numerically
parity-tested against transformers' T5EncoderModel in tests/test_t5.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    # "gated-gelu" (v1.1) or "relu" (original T5)
    feed_forward_proj: str = "gated-gelu"
    compute_dtype: Any = jnp.bfloat16

    @classmethod
    def xxl(cls) -> "T5Config":
        """google/t5-v1_1-xxl — FLUX.1-dev text_encoder_2."""
        return cls()


def _rms(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    # T5LayerNorm: fp32 variance, no mean subtraction, scale in weight dtype
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dtype) * scale.astype(dtype)


def relative_position_buckets(qlen: int, klen: int, num_buckets: int,
                              max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing → [qlen, klen] int32."""
    ctx = jnp.arange(qlen)[:, None]
    mem = jnp.arange(klen)[None, :]
    rel = mem - ctx  # relative position of key wrt query
    num_buckets = num_buckets // 2
    ret = jnp.where(rel > 0, num_buckets, 0)
    n = jnp.abs(rel)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def position_bias(params: Dict, cfg: T5Config, qlen: int, klen: int) -> jnp.ndarray:
    """[1, heads, qlen, klen] fp32 additive bias (block 0's embedding,
    shared across all layers)."""
    buckets = relative_position_buckets(
        qlen, klen, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    emb = params["relative_attention_bias"]  # [num_buckets, heads]
    bias = emb[buckets]  # [qlen, klen, heads]
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


def _attention(block: Dict, cfg: T5Config, x: jnp.ndarray,
               bias: jnp.ndarray) -> jnp.ndarray:
    cdt = cfg.compute_dtype
    b, l, _ = x.shape
    nh, dk = cfg.num_heads, cfg.d_kv

    def proj(w, v):
        return jnp.dot(v, w.astype(cdt)).reshape(b, l, nh, dk).transpose(0, 2, 1, 3)

    q = proj(block["q"], x)  # NOTE: T5 does NOT scale q by 1/sqrt(d_kv)
    k = proj(block["k"], x)
    v = proj(block["v"], x)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(cdt)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(cdt)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, nh * dk)
    return jnp.dot(out, block["o"].astype(cdt))


def _ff(block: Dict, cfg: T5Config, x: jnp.ndarray) -> jnp.ndarray:
    cdt = cfg.compute_dtype
    if cfg.feed_forward_proj == "gated-gelu":
        h = jax.nn.gelu(jnp.dot(x, block["wi_0"].astype(cdt)),
                        approximate=True)  # gelu_new
        h = h * jnp.dot(x, block["wi_1"].astype(cdt))
    else:
        h = jax.nn.relu(jnp.dot(x, block["wi"].astype(cdt)))
    return jnp.dot(h, block["wo"].astype(cdt))


def t5_encode(params: Dict, cfg: T5Config, input_ids: jnp.ndarray
              ) -> List[jnp.ndarray]:
    """Run the encoder stack. Returns the hidden_states list with HF
    semantics: [embeddings, layer1_out, …, layerN_out(pre-norm),
    final(post-norm)] — len = num_layers + 2... matching transformers'
    `output_hidden_states=True` tuple (embedding + one per layer, where the
    last entry is post-final-layer-norm)."""
    cdt = cfg.compute_dtype
    x = params["embed"][input_ids].astype(cdt)
    states = [x]
    bias = None
    for i, block in enumerate(params["blocks"]):
        if bias is None:
            bias = position_bias(block, cfg, x.shape[1], x.shape[1])
        h = _rms(x, block["ln1"], cfg.layer_norm_eps)
        x = x + _attention(block, cfg, h, bias)
        h = _rms(x, block["ln2"], cfg.layer_norm_eps)
        x = x + _ff(block, cfg, h)
        states.append(x)
    # HF replaces the last collected state with the post-final-norm output
    final = _rms(x, params["final_ln"], cfg.layer_norm_eps)
    states[-1] = final
    return states


def final_layer_norm(params: Dict, cfg: T5Config, x: jnp.ndarray) -> jnp.ndarray:
    return _rms(x, params["final_ln"], cfg.layer_norm_eps)


def encode(params: Dict, cfg: T5Config, input_ids: jnp.ndarray,
           return_index: int = -1) -> jnp.ndarray:
    """`encode_prompt_with_t5` core (`utils.py:62-69`): hidden_states[idx],
    re-normed when idx ≠ -1."""
    states = t5_encode(params, cfg, input_ids)
    out = states[return_index]
    if return_index != -1:
        out = final_layer_norm(params, cfg, out)
    return out


# ---------------------------------------------------------------------------
# Weight conversion + init
# ---------------------------------------------------------------------------


def convert_torch_t5(state_dict: Dict[str, Any], cfg: T5Config) -> Dict:
    """torch T5EncoderModel state dict → our param tree (all [in, out])."""

    def get(name):
        w = state_dict[name]
        arr = np.asarray(w.float().numpy() if hasattr(w, "float") else w,
                         np.float32)
        return jnp.asarray(arr)

    def lin(name):  # torch [out, in] → [in, out]
        return get(name).T

    p: Dict[str, Any] = {
        "embed": get("shared.weight") if "shared.weight" in state_dict
        else get("encoder.embed_tokens.weight"),
        "final_ln": get("encoder.final_layer_norm.weight"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        blk = {
            "ln1": get(f"{pre}.0.layer_norm.weight"),
            "q": lin(f"{pre}.0.SelfAttention.q.weight"),
            "k": lin(f"{pre}.0.SelfAttention.k.weight"),
            "v": lin(f"{pre}.0.SelfAttention.v.weight"),
            "o": lin(f"{pre}.0.SelfAttention.o.weight"),
            "ln2": get(f"{pre}.1.layer_norm.weight"),
        }
        if i == 0:
            blk["relative_attention_bias"] = get(
                f"{pre}.0.SelfAttention.relative_attention_bias.weight"
            )
        if cfg.feed_forward_proj == "gated-gelu":
            blk["wi_0"] = lin(f"{pre}.1.DenseReluDense.wi_0.weight")
            blk["wi_1"] = lin(f"{pre}.1.DenseReluDense.wi_1.weight")
        else:
            blk["wi"] = lin(f"{pre}.1.DenseReluDense.wi.weight")
        blk["wo"] = lin(f"{pre}.1.DenseReluDense.wo.weight")
        p["blocks"].append(blk)
    return p


def init_t5(rng: jax.Array, cfg: T5Config, dtype=jnp.float32) -> Dict:
    """Random init (tests / offline use; real weights come from conversion).
    `dtype` casts each leaf at creation — at XXL scale (4.7B) an fp32 tree
    is 18.8 GB, past one v5e's HBM; bf16 leaves stream in at 9.4 GB."""
    keys = jax.random.split(rng, 2 + cfg.num_layers)
    d, dkv, nh, dff = cfg.d_model, cfg.d_kv, cfg.num_heads, cfg.d_ff

    def norm(k, fan_in, fan_out, scale=1.0):
        return (jax.random.normal(k, (fan_in, fan_out), jnp.float32) * (
            scale / np.sqrt(fan_in)
        )).astype(dtype)

    p = {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, d),
                                   jnp.float32).astype(dtype),
        "final_ln": jnp.ones((d,), dtype),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[2 + i], 8)
        blk = {
            "ln1": jnp.ones((d,), dtype),
            "q": norm(ks[0], d, nh * dkv),
            "k": norm(ks[1], d, nh * dkv),
            "v": norm(ks[2], d, nh * dkv),
            "o": norm(ks[3], nh * dkv, d),
            "ln2": jnp.ones((d,), dtype),
            "wo": norm(ks[6], dff, d),
        }
        if i == 0:
            blk["relative_attention_bias"] = (
                jax.random.normal(ks[7], (cfg.relative_attention_num_buckets, nh))
                * 0.1
            ).astype(dtype)
        if cfg.feed_forward_proj == "gated-gelu":
            blk["wi_0"] = norm(ks[4], d, dff)
            blk["wi_1"] = norm(ks[5], d, dff)
        else:
            blk["wi"] = norm(ks[4], d, dff)
        p["blocks"].append(blk)
    return p
