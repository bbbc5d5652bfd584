from .camera import Camera, CameraSpec
from .material import Material, Materials
from .mesh import Mesh, MeshInstance, Triangle, triangles_to_array, mesh_volume
from .scene import Scene, TracerScene, build_tracer_scene
from . import scenes
