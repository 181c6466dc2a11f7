"""Train f32 -> serve int8: convert a trained DLRM's embedding parameters
to the capacity-mode layout without touching the dense MLP weights.

The reference quantizes tables once at load time (int32 fixed point,
SURVEY.md §3.3 / emb_host.h:207-212) because its DPU path is
inference-only.  Here the production cycle is: train in f32/bf16 (sparse
scatter updates need float rows), then quantize the trained tables to
int8+per-row-scale for serving — 4x the rows per chip at serving time.
The hybrid split keeps the MXU small set exact (it costs almost nothing)
and quantizes only the big gather set.

    model = DLRM(cfg, mesh, policy, hybrid=True)
    ...train...
    serve_coll, serve_params = quantize_dlrm_embeddings(model, params)
    pooled = serve_coll.lookup(serve_params["emb"], idx, mask, batch_size=b)
    logits = model.apply_from_pooled(serve_params, dense, pooled)
"""

from __future__ import annotations

from ..parallel.collection import EmbeddingCollection
from ..parallel.hybrid import HybridEmbeddingCollection
from ..parallel.quantized_collection import QuantizedEmbeddingCollection


def quantize_dlrm_embeddings(
    model, params, *, scale_mode: str = "table"
) -> tuple[object, dict]:
    """(model, trained params) -> (serving collection, serving params).

    Plain collection -> QuantizedEmbeddingCollection (all tables int8).
    Hybrid -> HybridEmbeddingCollection(quantized_big=True): the MXU small
    set keeps its trained f32 weights, the big set re-fuses as int8+scale.
    The returned params dict mirrors the input ({"emb": ..., dense keys
    unchanged}) so model.apply_from_pooled works verbatim.

    ``scale_mode``: "table" (default — per-table scale folded post-pool,
    one gather issue/entry) or "row" (per-row scales, finer quantization
    of trained tables at 2x gather issues; measured accuracy delta is
    reported in docs/PERF.md and tests/test_quantize_serving.py).
    """
    from ..config import ShardingPolicy

    coll = model.collection
    out = dict(params)
    if isinstance(coll, HybridEmbeddingCollection):
        if coll.big is None:
            return coll, out  # nothing to quantize
        if isinstance(coll.big, QuantizedEmbeddingCollection):
            return coll, out  # already the serving layout
        if coll.big.layout.policy == ShardingPolicy.COLUMN:
            raise ValueError(
                "quantize_dlrm_embeddings: COLUMN sharding would split "
                "per-row scales — retrain/re-shard rowish or REPLICATE for "
                "int8 serving"
            )
        big_tables = coll.big.unfuse_host(params["emb"]["big"])
        # same FusedLayout: identical policy/pack/offsets/striding, so the
        # int8 storage is a drop-in for the f32 fused array
        qbig = QuantizedEmbeddingCollection(
            layout=coll.big.layout, mesh=coll.mesh, scale_mode=scale_mode
        )
        serve_coll = HybridEmbeddingCollection(
            tables=coll.tables,
            mesh=coll.mesh,
            small=coll.small,
            big=qbig,
            small_ids=coll.small_ids,
            big_ids=coll.big_ids,
            perm=coll.perm,
            buckets=coll.buckets,
        )
        out["emb"] = {
            "small": params["emb"]["small"],
            "big": qbig.quantize_tables(big_tables),
        }
        return serve_coll, out
    if coll.layout.policy == ShardingPolicy.COLUMN:
        raise ValueError(
            "quantize_dlrm_embeddings: COLUMN sharding would split per-row "
            "scales — retrain/re-shard rowish or REPLICATE for int8 serving"
        )
    tables = coll.unfuse_host(params["emb"])
    qcoll = QuantizedEmbeddingCollection(
        layout=coll.layout, mesh=coll.mesh, scale_mode=scale_mode
    )
    out["emb"] = qcoll.quantize_tables(tables)
    return qcoll, out
