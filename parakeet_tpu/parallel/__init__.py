"""Mesh/sharding helpers for SPMD data/tensor/sequence/pipeline parallelism."""
from .mesh import (data_parallel_sharding, fs2_tp_pp_spec, fs2_tp_spec,
                   local_batch_slice,
                   make_mesh, pp_stack_spec, process_index, rank_zero_only,
                   replicate, shard_batch, shard_params_by_rule,
                   transformer_tp_spec)
from .pipeline import (make_pp_layer_runner, pipeline_layers,
                       pipelined_layers, stack_layer_params,
                       unstack_layer_params)
from .ring_attention import (make_ring_attn_core, ring_attention,
                             sequence_parallel_self_attention)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_sharding",
           "rank_zero_only", "process_index", "local_batch_slice",
           "fs2_tp_spec", "transformer_tp_spec", "shard_params_by_rule",
           "ring_attention", "sequence_parallel_self_attention",
           "make_ring_attn_core", "pipeline_layers", "pipelined_layers",
           "make_pp_layer_runner", "stack_layer_params",
           "unstack_layer_params", "pp_stack_spec", "fs2_tp_pp_spec"]
