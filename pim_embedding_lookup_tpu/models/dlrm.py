"""DLRM — dense bottom/top MLPs + dot feature interaction + sharded
embedding collection.

Re-provides the model layer the reference keeps in its (absent)
PIM-dlrm-new submodule, whose contract is pinned by the CLI at
run.sh:72-82/110-121 and README.md:6-14: bot MLP over 13 dense features,
26 EmbeddingBag lookups, pairwise-dot interaction, top MLP to one logit,
sigmoid/BCE.  The reference hooks apply_emb out to the DPUs via ctypes
(SURVEY.md §3.3); here the same seam is EmbeddingCollection.lookup, and the
whole forward is one jitted XLA program — dense math in bf16-friendly
matmuls on the MXU, batch sharded over the mesh's data axis.

Parameters are a plain pytree (dict), so the model composes with jax.grad,
optax, and orbax without framework baggage.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DLRMConfig, ShardingPolicy
from ..parallel.collection import EmbeddingCollection
from ..parallel.mesh import DATA_AXIS

Params = dict[str, Any]


def _init_mlp(key, sizes: Sequence[int]) -> list[dict[str, jax.Array]]:
    """dlrm-style init: normal(0, sqrt(2/(fan_in+fan_out))) for W and b."""
    layers = []
    for i in range(len(sizes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        fan_in, fan_out = sizes[i], sizes[i + 1]
        std = np.sqrt(2.0 / (fan_in + fan_out)).astype(np.float32)
        layers.append(
            {
                "w": jax.random.normal(k1, (fan_in, fan_out), jnp.float32) * std,
                "b": jax.random.normal(k2, (fan_out,), jnp.float32) * std,
            }
        )
    return layers


def _apply_mlp(layers, x, *, sigmoid_last: bool) -> jax.Array:
    n = len(layers)
    for i, lyr in enumerate(layers):
        x = jnp.dot(x, lyr["w"], preferred_element_type=jnp.float32) + lyr["b"]
        if i == n - 1 and sigmoid_last:
            pass  # logits out; sigmoid applied by caller/loss
        else:
            x = jax.nn.relu(x)
    return x


def interact_dot(bot_out: jax.Array, pooled: jax.Array, *, self_interaction: bool
                 ) -> jax.Array:
    """Pairwise dot-product interaction (dlrm 'dot' arch).

    bot_out [B, D], pooled [B, T, D] -> [B, D + T*(T+1)/2 (+T+1 if self)].
    The concat order (dense vector first, then lower-triangular dots) follows
    the upstream dlrm interact_features contract reconstructed in
    SURVEY.md §3.3.
    """
    b, d = bot_out.shape
    z = jnp.concatenate([bot_out[:, None, :], pooled], axis=1)  # [B, 1+T, D]
    zz = jnp.einsum("bid,bjd->bij", z, z)  # [B, 1+T, 1+T] on the MXU
    nf = z.shape[1]
    offset = 0 if self_interaction else -1
    li, lj = np.tril_indices(nf, offset)
    flat = zz[:, li, lj]  # [B, npairs]
    return jnp.concatenate([bot_out, flat], axis=1)


class DLRM:
    """DLRM over a sharded embedding collection.

    Query format: indices [T, B*L] (per-table local row ids, flat over
    (batch, slot)) + mask [T, B*L] — the padded multi-hot contract of the
    reference (MAX_INDICES_PER_BATCH, emb_host.h:30), kept 2-D so TPU tile
    layouts stay compact (see parallel/collection.py docstring).
    """

    def __init__(
        self,
        config: DLRMConfig,
        mesh,
        policy: ShardingPolicy = ShardingPolicy.AUTO,
        *,
        hybrid: bool = False,
    ):
        self.config = config
        self.mesh = mesh
        self.hybrid = hybrid
        if hybrid:
            from ..parallel.hybrid import HybridEmbeddingCollection

            self.collection = HybridEmbeddingCollection.create(
                config.tables, mesh, policy
            )
        else:
            self.collection = EmbeddingCollection.create(config.tables, mesh, policy)
        d = config.sparse_dim
        if config.mlp_bot[-1] != d:
            raise ValueError(
                f"bot MLP must end at sparse dim {d}, got {config.mlp_bot[-1]}"
            )
        nf = config.num_tables + 1
        npairs = nf * (nf + 1) // 2 if config.interact_itself else nf * (nf - 1) // 2
        self._top_in = d + npairs

    def init(self, key: jax.Array) -> Params:
        k_emb, k_bot, k_top = jax.random.split(key, 3)
        # dense params live replicated on the mesh (DP over the data axis);
        # explicit placement keeps device sets consistent with the sharded
        # embedding after checkpoint restore.
        rep = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
        dense_params = {
            "bot": _init_mlp(k_bot, [self.config.dense_dim, *self.config.mlp_bot]),
            "top": _init_mlp(k_top, [self._top_in, *self.config.mlp_top]),
        }
        dense_params = jax.device_put(dense_params, rep)
        return {"emb": self.collection.init(k_emb), **dense_params}

    def apply_from_pooled(
        self,
        params: Params,
        dense: jax.Array,  # [B, dense_dim]
        pooled: jax.Array,  # [B, T, D] pooled embedding vectors
    ) -> jax.Array:  # [B] logits
        """Dense half only (bot MLP -> interaction -> top MLP).  Exposed as a
        separate stage so the sparse training path can differentiate the
        dense tower w.r.t. pooled vectors without densifying table grads
        (models/sparse_train.py)."""
        bot_out = _apply_mlp(params["bot"], dense, sigmoid_last=False)
        zi = interact_dot(
            bot_out, pooled, self_interaction=self.config.interact_itself
        )
        logits = _apply_mlp(params["top"], zi, sigmoid_last=True)
        return logits[:, 0]

    def apply(
        self,
        params: Params,
        dense: jax.Array,  # [B, dense_dim] float
        indices: jax.Array,  # [T, B*L] int32 (flat (batch, slot) per table)
        mask: jax.Array,  # [T, B*L] bool
    ) -> jax.Array:  # [B] logits
        pooled = self.collection.lookup(
            params["emb"], indices, mask, batch_size=dense.shape[0]
        )  # [B, T, D]
        return self.apply_from_pooled(params, dense, pooled)

    def predict(self, params, dense, indices, mask) -> jax.Array:
        """Click probabilities (the reference harness's sigmoid output)."""
        return jax.nn.sigmoid(self.apply(params, dense, indices, mask))


def bce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """--loss-function=bce (README.md:10)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
