from raytracer_tpu.parallel.sharding import (  # noqa: F401
    make_pixel_mesh,
    render_frame_sharded,
    shard_accum,
)
