"""Live-edit demo: change a material MID-RENDER and watch accumulation reset.

The headless analog of the reference's ImGui material editor
(src/raytracer/ui.odin:262-347,585-725): every edit goes through the scene's
change journal, is replayed by begin_frame on the next step (the
raytracing_renderer.odin:141-187 path), and zeroes the progressive
accumulation — while the renderer keeps stepping, writing a preview PNG as
it goes (the `--preview` CLI mode drives the same loop for file scenes).

Run from the repo root:  python examples/live_edit.py [out_prefix]
"""

import dataclasses
import sys

sys.path.insert(0, ".")

from raytracer_tpu.api import ProgressiveRenderer
from raytracer_tpu.scene.model import create_cornell_box
from raytracer_tpu.utils.config import RenderConfig
from raytracer_tpu.utils.image import write_image
from raytracer_tpu.utils.stats import RenderStats


def main():
    prefix = sys.argv[1] if len(sys.argv) > 1 else "live_edit"
    scene = create_cornell_box()
    r = ProgressiveRenderer(scene, None, RenderConfig(width=160, height=160))
    stats = RenderStats()
    stats.set_scene_counts(scene)

    def accumulate(n, tag):
        for _ in range(n):
            stats.frame_begin()
            r.step()
            stats.frame_end()
        write_image(f"{prefix}_{tag}.png", r.image())
        print(f"{tag}: accumulated to {r.frame} spp -> {prefix}_{tag}.png")
        print(stats.format_table())

    accumulate(12, "before")

    # Mid-render edit: repaint the tall-box material red, exactly like
    # dragging the albedo color picker in the reference's editor.
    idx = next(
        i for i, o in enumerate(scene.objects) if "left" in o.name.lower()
        or "tall" in o.name.lower()
    ) if any("tall" in o.name.lower() or "left" in o.name.lower()
             for o in scene.objects) else 0
    obj = scene.objects[idx]
    mat = scene.materials[obj.material_index]
    scene.update_material(
        obj.material_index, dataclasses.replace(mat, albedo=(0.85, 0.1, 0.1))
    )
    print(f"edited material {obj.material_index} ({obj.name!r}) -> red")

    frames_before_edit = r.frame
    accumulate(12, "after")
    assert r.frame <= 12, (
        "material edit must have reset accumulation "
        f"(was {frames_before_edit}, now {r.frame})"
    )
    print(f"accumulation reset on edit: {frames_before_edit} -> {r.frame} "
          "frames")


if __name__ == "__main__":
    main()
