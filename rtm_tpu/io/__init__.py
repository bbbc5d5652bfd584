from .mesh_loader import load_mesh, load_gltf, load_obj
from .image import load_texture, load_hdr_ldr, save_png, to_u8
from .assets import asset_path, have_reference_assets
