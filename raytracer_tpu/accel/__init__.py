from raytracer_tpu.accel.bvh import BVH, build_bvh  # noqa: F401
