from raytracer_tpu.scene.model import (  # noqa: F401
    Material,
    Mesh,
    Object,
    Scene,
    SceneChange,
    SceneChangeType,
    Transform,
    create_cornell_box,
    create_plane,
    create_sphere,
)
from raytracer_tpu.scene.loaders import load_scene  # noqa: F401
from raytracer_tpu.scene.device_scene import SceneOnDevice, bake_scene  # noqa: F401
