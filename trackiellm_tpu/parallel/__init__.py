"""Multi-chip scaling: device mesh, sharding rules, sharded train step.

The reference has **no** distributed compute (SURVEY.md section 2.10 —
no NCCL/MPI/collectives anywhere); its parallelism is host threads and
CUDA copy streams. This package is where the TPU rebuild goes beyond it:
the LLM shards over an ICI mesh via `jax.sharding` + jit, with XLA
inserting the collectives (scaling-book recipe: pick a mesh, annotate
shardings, let the compiler place psum/all-gather).

Axes: ``dp`` (data parallel over batch), ``fsdp`` (parameter/optimizer
sharding, also folded into the batch axis), ``tp`` (tensor parallel over
attention heads / MLP hidden, with Megatron sequence-parallel residuals
in the train step), and ``pp`` (GPipe pipeline stages via shard_map +
ppermute, `parallel/pipeline.py`). MoE has two layouts: the default
shards banks within-expert over tp (exact, one psum, no load-balance
pathology — docs/ARCHITECTURE.md); past ~8 experts an optional ``ep``
axis shards whole experts with GShard capacity-based dispatch
(`parallel/moe.py`, ``build_mesh(..., ep=N)``).
"""

from trackiellm_tpu.parallel.infer import (  # noqa: F401
    batched_kv_sharding,
    batched_mla_sharding,
    infer_param_shardings,
    kv_cache_sharding,
    make_sharded_decode,
    make_sharded_mla,
    make_sharded_prefill,
    mla_cache_sharding,
    mla_param_shardings,
    paged_pool_sharding,
    quant_pool_sharding,
)
from trackiellm_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    shard_host_batch,
)
from trackiellm_tpu.parallel.moe import (  # noqa: F401
    dispatch_combine,
    ep_moe_mlp,
    ep_param_shardings,
)
from trackiellm_tpu.parallel.sharding import (  # noqa: F401
    data_sharding,
    param_shardings,
)
from trackiellm_tpu.parallel.pipeline import (  # noqa: F401
    init_pp_train_state,
    make_pp_train_step,
    pp_loss,
)
from trackiellm_tpu.parallel.ring import (  # noqa: F401
    cp_lm_forward,
    ring_attention,
)
from trackiellm_tpu.parallel.train import (  # noqa: F401
    init_train_state,
    lm_forward_batched,
    make_train_step,
    restore_train_state,
    save_train_state,
    vocab_parallel_ce,
)
