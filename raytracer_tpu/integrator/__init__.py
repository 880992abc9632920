from raytracer_tpu.integrator.wavefront import render_frame, render_wavefront  # noqa: F401
