from sinnerf_tpu.core.activations import shifted_softplus, widened_sigmoid
from sinnerf_tpu.core.composite import CompositeOut, composite, compute_weights
from sinnerf_tpu.core.encoding import out_channels, positional_encoding
from sinnerf_tpu.core.rays import (
    get_ndc_rays,
    get_ray_directions,
    get_ray_directions_pz,
    get_rays,
    make_ray_bundle,
)
from sinnerf_tpu.core.sampling import (
    sample_pdf,
    searchsorted_right,
    stratified_z_vals,
)

__all__ = [
    "shifted_softplus",
    "widened_sigmoid",
    "CompositeOut",
    "composite",
    "compute_weights",
    "out_channels",
    "positional_encoding",
    "get_ndc_rays",
    "get_ray_directions",
    "get_ray_directions_pz",
    "get_rays",
    "make_ray_bundle",
    "sample_pdf",
    "searchsorted_right",
    "stratified_z_vals",
]
