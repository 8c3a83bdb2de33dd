"""Device-mesh scaling: data-parallel frame sharding + spatial partitioning.

The reference's only parallelism is libvmaf's CPU thread pool over frames
(``n_threads``, app/vmaf_analyzer.py:378). Here the same frame-level
parallelism maps onto a ``("data", "space")`` jax Mesh: the frame batch
shards over "data" (the primary axis — frames are independent except
motion2's one-frame halo, which XLA turns into a collective-permute), and
frame *rows* shard over "space" for very large frames (4K) so a single
frame's filters can spread across chips with halo exchange handled by XLA
(SURVEY.md section 2.4).
"""

from pqa2_tpu.parallel.mesh import (
    frame_sharding,
    make_mesh,
    replicated,
    shard_frames,
)
from pqa2_tpu.parallel.scoring import (
    make_sharded_scorer,
    make_shardmap_scorer,
    score_clip_sharded,
    sharded_extract,
)
