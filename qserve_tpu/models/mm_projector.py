"""Multimodal projector: vision features -> LLM embedding space.

Reference counterpart: llava_base/multimodal_projector/builder.py:34+
(linear / mlp2x_gelu) plus VILA's downsample variant (which is how VILA-1.5
arrives at 196 tokens/image from a larger patch grid: 2x2 spatial concat
before the MLP). Params are plain [in, out] matrices applied with bf16
matmuls.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ProjectorArgs:
    kind: str  # "linear" | "mlpNx_gelu" | "mlp_downsample"
    vision_hidden: int
    llm_hidden: int
    grid: int  # vision patch grid (per side)
    compute_dtype: Any = jnp.bfloat16

    @property
    def downsample(self) -> bool:
        return "downsample" in self.kind

    @property
    def num_mlp_layers(self) -> int:
        m = re.match(r"mlp(\d+)x_gelu", self.kind)
        if m:
            return int(m.group(1))
        return 2 if self.downsample else 1

    @property
    def out_grid(self) -> int:
        return -(-self.grid // 2) if self.downsample else self.grid

    @property
    def tokens_per_image(self) -> int:
        return self.out_grid * self.out_grid

    @property
    def in_features(self) -> int:
        return self.vision_hidden * (4 if self.downsample else 1)


class ProjectorParams(NamedTuple):
    weights: Any  # tuple of [in, out] matrices
    biases: Any  # tuple of [out] vectors (or None)


def downsample_2x2(x: jax.Array, grid: int) -> jax.Array:
    """[B, grid*grid, D] -> [B, ceil(grid/2)^2, 4*D] (VILA mlp_downsample).

    Odd grids are zero-padded on the bottom/right edge before the 2x2
    neighborhood concat (matches VILA's flat_square padding behavior).
    """
    B, N, D = x.shape
    assert N == grid * grid
    g2 = -(-grid // 2) * 2
    xi = x.reshape(B, grid, grid, D)
    if g2 != grid:
        xi = jnp.pad(xi, ((0, 0), (0, g2 - grid), (0, g2 - grid), (0, 0)))
    xi = xi.reshape(B, g2 // 2, 2, g2 // 2, 2, D)
    xi = xi.transpose(0, 1, 3, 2, 4, 5)  # [B, g/2, g/2, 2, 2, D]
    return xi.reshape(B, (g2 // 2) * (g2 // 2), 4 * D)


def apply_projector(
    params: ProjectorParams, feats: jax.Array, args: ProjectorArgs
) -> jax.Array:
    """[B, num_patches, Dv] -> [B, tokens_per_image, E_llm]."""
    dt = args.compute_dtype
    x = feats.astype(dt)
    if args.downsample:
        x = downsample_2x2(x, args.grid)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        if i > 0:
            x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(dt)
        y = jax.lax.dot_general(
            x, w.astype(dt), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            y = y + b
        x = y.astype(dt)
    return x


def params_from_hf_state(state: dict, args: ProjectorArgs) -> ProjectorParams:
    """From llava/VILA checkpoint keys: model.mm_projector.{i}.weight/bias
    (sequential indices skip the GELUs), or mm_projector.* without prefix."""
    items = {}
    for k, v in state.items():
        m = re.search(r"mm_projector\.(?:layers\.)?(\d+)\.(weight|bias)", k)
        if m:
            items[(int(m.group(1)), m.group(2))] = np.asarray(v)
        elif re.search(r"mm_projector\.(weight|bias)$", k):  # bare linear
            items[(0, k.rsplit(".", 1)[1])] = np.asarray(v)
    idxs = sorted({i for i, _ in items})
    weights, biases = [], []
    for i in idxs:
        weights.append(jnp.asarray(items[(i, "weight")].T))
        b = items.get((i, "bias"))
        biases.append(None if b is None else jnp.asarray(b))
    assert weights, "no mm_projector weights found"
    return ProjectorParams(weights=tuple(weights), biases=tuple(biases))


def random_params(key: jax.Array, args: ProjectorArgs, scale=0.02) -> ProjectorParams:
    dims = [args.in_features]
    for _ in range(args.num_mlp_layers - 1):
        dims.append(args.llm_hidden)
    dims.append(args.llm_hidden)
    ks = jax.random.split(key, len(dims) - 1)
    weights = tuple(
        jax.random.normal(ks[i], (dims[i], dims[i + 1]), jnp.float32) * scale
        for i in range(len(dims) - 1)
    )
    biases = tuple(jnp.zeros(dims[i + 1]) for i in range(len(dims) - 1))
    return ProjectorParams(weights=weights, biases=biases)
