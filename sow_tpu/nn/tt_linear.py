"""TT-parameterized linear layer (C3 — ref ``tn_gradient/layer/tensor_linear.py``).

The weight matrix lives as a tensor train; the forward pads the input
features to ``in_core**order``, reshapes them onto the core grid, and
contracts against all cores in a single einsum (XLA picks the path — the
reference caches an opt_einsum expression, ``tensor_linear.py:60-72``).
Referenced by the reference's ``--architecture slinear/sttlinear`` flags but
never wired into a current script (SURVEY C3); here it is a first-class
layer usable anywhere a linear subtree is.
"""

from __future__ import annotations

import dataclasses
import math
import string
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from sow_tpu.tt import TensorTrain

_L = string.ascii_letters


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("cores", "bias"),
    meta_fields=("in_features", "out_features"),
)
@dataclasses.dataclass
class TTLinear:
    """Linear layer with a TT-factored weight.

    ``cores[k]``: (r_k, in_core, out_core, r_{k+1}); effective weight is the
    TT reconstruction reshaped to (in_core**d, out_core**d) and cropped to
    (in_features, out_features).
    """

    cores: tuple
    bias: Optional[jax.Array]
    in_features: int
    out_features: int

    @property
    def order(self) -> int:
        return len(self.cores)

    @staticmethod
    def create(
        key: jax.Array,
        in_features: int,
        out_features: int,
        ranks: Sequence[int],
        bias: bool = True,
        dtype=jnp.float32,
    ) -> "TTLinear":
        """Kaiming-uniform per-core init (ref ``tensor_linear.py:43-52``)."""
        order = len(ranks) - 1
        in_core = math.ceil(in_features ** (1 / order))
        out_core = math.ceil(out_features ** (1 / order))
        while (in_core - 1) ** order >= in_features:
            in_core -= 1
        while (out_core - 1) ** order >= out_features:
            out_core -= 1
        keys = jax.random.split(key, order)
        cores = []
        for k in range(order):
            shape = (ranks[k], in_core, out_core, ranks[k + 1])
            fan_in = shape[0] * shape[1]
            bound = math.sqrt(6.0 / fan_in)
            cores.append(jax.random.uniform(keys[k], shape, jnp.float32, -bound, bound).astype(dtype))
        return TTLinear(
            cores=tuple(cores),
            bias=jnp.zeros((out_features,), dtype) if bias else None,
            in_features=in_features,
            out_features=out_features,
        )

    def tt(self) -> TensorTrain:
        return TensorTrain(self.cores)

    def __call__(self, x: jax.Array) -> jax.Array:
        """Pad -> reshape onto the core grid -> contract -> crop.

        One einsum over (input grid, all cores); contraction order chosen by
        XLA. FLOPs are O(batch * sum_k r_k r_{k+1} i_k prod(...)) — far less
        than materializing the dense weight for large layers.
        """
        d = self.order
        in_core = self.cores[0].shape[1]
        out_core = self.cores[0].shape[2]
        in_pad = in_core**d
        out_pad = out_core**d

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if in_pad != self.in_features:
            x2 = jnp.pad(x2, ((0, 0), (0, in_pad - self.in_features)))
        xg = x2.reshape((-1,) + (in_core,) * d)

        # einsum: batch 'Z'; in_k -> _L[k]; out_k -> _L[d+k]; bond_k -> _L[2d+k]
        terms = ["Z" + _L[:d]]
        operands = [xg]
        for k in range(d):
            terms.append(_L[26 + k] + _L[k] + _L[d + k] + _L[26 + k + 1])
            operands.append(self.cores[k])
        out_spec = "Z" + _L[d : 2 * d]
        spec = ",".join(terms) + "->" + out_spec
        yg = jnp.einsum(spec, *operands)

        y = yg.reshape(-1, out_pad)[:, : self.out_features]
        y = y.reshape(*lead, self.out_features)
        if self.bias is not None:
            y = y + self.bias
        return y

    def dense_weight(self) -> jax.Array:
        """Materialize the (in, out) weight — for tests/export."""
        return self.tt().to_matrix((self.in_features, self.out_features))

    def numel(self) -> int:
        n = sum(int(math.prod(c.shape)) for c in self.cores)
        if self.bias is not None:
            n += int(self.bias.size)
        return n
