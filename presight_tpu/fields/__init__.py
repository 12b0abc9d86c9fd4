"""Fields: stacked multi-scene expert iNGP / proposal / sky fields."""

from .router import (
    PaddedRouting,
    Routing,
    assign_experts,
    build_padded_routing,
    build_routing,
    pad_rows,
    route_positions,
    route_positions_padded,
    unpad_rows,
)
from .ingp_field import (
    INGPFieldConfig,
    density_and_embedding_padded,
    density_and_embedding_sorted,
    init_ingp_field,
    rgb_padded,
    rgb_sorted,
    semantics_padded,
    semantics_sorted,
)
from .prop_field import PropFieldConfig, init_prop_field, prop_density, prop_density_sorted
from .sky_field import SkyFieldConfig, init_sky_field, sky_outputs_sorted
