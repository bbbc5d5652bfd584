from . import rng, intersect, shade, trace_ref
