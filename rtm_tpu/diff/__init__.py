from .params import SceneParams, apply_params, extract_params
from .inverse import InverseRenderConfig, inverse_render, render_loss
