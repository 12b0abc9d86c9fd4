"""Model assemblies."""

from .nerfacto_ms import (
    NerfactoNuscMSConfig,
    ProposalUpdateSchedule,
    anneal_at,
    apply_collider,
    compute_losses,
    field_density,
    field_semantics,
    forward,
    forward_depth,
    init_model,
    line_of_sight_mult_at,
    line_of_sight_sigma_at,
    param_groups,
)
