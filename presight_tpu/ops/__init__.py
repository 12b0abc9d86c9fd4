"""Pure-functional compute ops (jnp + Pallas)."""

from .math import (
    contract_linf,
    contract_positions,
    masked_mean,
    normalize_aabb,
    sh_encoding,
    trunc_exp,
)
from .hash_encoding import HashEncodingConfig, hash_encode, init_hash_table
from .mlp import (
    apply_mlp,
    apply_mlp_dense_experts,
    apply_mlp_grouped,
    init_mlp,
    mlp_layer_dims,
)
from .rays import RayBundle, RaySamples, get_weights
from .renderers import (
    render_accumulation,
    render_depth_expected,
    render_depth_median,
    render_rgb,
    render_semantics,
)
from .samplers import SpacingSpec, pdf_sample, proposal_sample, spaced_sample, spacing_to_euclidean
from .stepfun import (
    blur_stepfun,
    distortion_loss,
    interlevel_loss,
    lossfun_distortion,
    lossfun_outer,
    ray_samples_to_sdist,
    sorted_interp_quad,
    z_anti_aliasing_interlevel_loss,
)
from . import losses
