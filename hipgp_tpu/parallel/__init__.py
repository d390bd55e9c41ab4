"""TPU parallelism: device meshes, exact data-parallel solves/training,
grid-sharded FFT solves, and multi-host (jax.distributed) scale-out."""
from . import multihost
from .mesh import NamedSharding, P, make_mesh, replicated, shard_batch
from .dp import dp_batch_solve, dp_elbo_and_grads, dp_svigp_fit, make_dp_train_step
from .mp import (
    grid_state_spec,
    make_mp_kn_fn,
    mp_batch_solve,
    mp_elbo_and_grads,
    mp_predict,
    mp_shard_state,
    mp_svigp_fit,
)
from .fft_sharded import (
    GridShardInfo,
    host_weights,
    local_circulant_apply,
    local_mask,
    local_whiten,
    local_whiten_diff,
    shard_multiples,
    sharded_gram_solve,
    sharded_inv_matmul,
    sharded_matmul_by_K,
)

__all__ = [
    "multihost",
    "GridShardInfo",
    "host_weights",
    "local_circulant_apply",
    "local_mask",
    "local_whiten",
    "shard_multiples",
    "sharded_gram_solve",
    "sharded_inv_matmul",
    "sharded_matmul_by_K",
    "NamedSharding",
    "P",
    "make_mesh",
    "replicated",
    "shard_batch",
    "dp_batch_solve",
    "dp_svigp_fit",
    "grid_state_spec",
    "local_whiten_diff",
    "make_mp_kn_fn",
    "mp_batch_solve",
    "mp_elbo_and_grads",
    "mp_predict",
    "mp_shard_state",
    "mp_svigp_fit",
    "dp_elbo_and_grads",
    "make_dp_train_step",
]
