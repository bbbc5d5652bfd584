from .renderer import ProgressiveRenderer, accumulate_step
