"""SDF / color decoder MLPs as functional (init, apply) modules.

TPU-native equivalents of the reference decoders (model/decoder.py):
  - SDFNet: MLP (no bias) mapping [hash(32) + oneblob(48) + explicit-tsdf(1)]
    -> [sdf(1) + geo_feat(15)] (decoder.py:59-110)
  - ColorNet: MLP (no bias) mapping [oneblob + geo_feat + explicit-rgb(3)]
    -> rgb(3) (decoder.py:6-53)
  - ColorSDFNet: the joint forward with residual concat logic
    (decoder.py:116-146)

These are tiny MLPs (hidden 32, 2 layers); on TPU the batched matmuls land on
the MXU and XLA fuses the surrounding concats/activations.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp


def _linear_init(key, in_dim, out_dim):
    """torch nn.Linear default: kaiming-uniform == U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), jnp.float32, -bound, bound)


class MLP:
    """Plain MLP; weights only (no bias) to mirror the reference decoders.

    `zero_init_last` starts the final layer at (near-)zero so the module's
    output is ~0 until gradients push it — the right inductive bias for
    RESIDUAL decoders: untrained regions then fall back exactly to the
    explicit TSDF/color instead of hallucinating (standard residual-learning
    practice; the reference relies on long training runs to wash this out).
    """

    def __init__(self, dims: List[int], activation=jax.nn.relu,
                 bias: bool = False, zero_init_last: bool = False):
        self.dims = dims
        self.activation = activation
        self.bias = bias
        self.zero_init_last = zero_init_last

    def init(self, key) -> Dict:
        params = {}
        keys = jax.random.split(key, len(self.dims) - 1)
        n_layers = len(self.dims) - 1
        for i in range(n_layers):
            w = _linear_init(keys[i], self.dims[i], self.dims[i + 1])
            if self.zero_init_last and i == n_layers - 1:
                w = w * 1e-4
            params[f"w{i}"] = w
            if self.bias:
                bound = 1.0 / math.sqrt(self.dims[i])
                params[f"b{i}"] = jax.random.uniform(
                    jax.random.fold_in(keys[i], 1), (self.dims[i + 1],),
                    jnp.float32, -bound, bound)
        return params

    def __call__(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        n_layers = len(self.dims) - 1
        h = x
        for i in range(n_layers):
            h = h @ params[f"w{i}"]
            if self.bias:
                h = h + params[f"b{i}"]
            if i != n_layers - 1:
                h = self.activation(h)
        return h


class SDFNet:
    def __init__(self, input_ch: int, geo_feat_dim: int = 15,
                 hidden_dim: int = 64, num_layers: int = 2):
        dims = [input_ch] + [hidden_dim] * (num_layers - 1) + [1 + geo_feat_dim]
        self.mlp = MLP(dims, zero_init_last=True)

    def init(self, key):
        return self.mlp.init(key)

    def __call__(self, params, x):
        return self.mlp(params, x)


class ColorNet:
    def __init__(self, input_ch: int, geo_feat_dim: int = 15,
                 hidden_dim_color: int = 64, num_layers_color: int = 3):
        dims = ([input_ch + geo_feat_dim]
                + [hidden_dim_color] * (num_layers_color - 1) + [3])
        self.mlp = MLP(dims, zero_init_last=True)

    def init(self, key):
        return self.mlp.init(key)

    def __call__(self, params, x):
        return self.mlp(params, x)


class ColorSDFNet:
    """Joint decoder: sdf branch sees [embed, embed_pos, explicit_tsdf];
    color branch sees [embed_pos, geo_feat, explicit_rgb]
    (reference decoder.py:116-146)."""

    def __init__(self, config, input_ch: int, input_ch_pos: int):
        dec = config["decoder"]
        self.sdf_net = SDFNet(
            input_ch=input_ch + input_ch_pos + 1,
            geo_feat_dim=dec["geo_feat_dim"],
            hidden_dim=dec["hidden_dim"],
            num_layers=dec["num_layers"],
        )
        self.color_net = ColorNet(
            input_ch=input_ch_pos + 3,
            geo_feat_dim=dec["geo_feat_dim"],
            hidden_dim_color=dec["hidden_dim_color"],
            num_layers_color=dec["num_layers_color"],
        )

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"sdf_net": self.sdf_net.init(k1),
                "color_net": self.color_net.init(k2)}

    def __call__(self, params, embed, embed_pos, ex_tsdf, ex_rgb):
        h = self.sdf_net(params["sdf_net"],
                         jnp.concatenate([embed, embed_pos, ex_tsdf], axis=-1))
        sdf, geo_feat = h[..., :1], h[..., 1:]
        rgb = self.color_net(
            params["color_net"],
            jnp.concatenate([embed_pos, geo_feat, ex_rgb], axis=-1))
        return jnp.concatenate([rgb, sdf], axis=-1)
