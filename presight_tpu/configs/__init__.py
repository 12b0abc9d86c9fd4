"""Config registry, serialization, CLI overrides."""

from .config_io import apply_overrides, load_config, parse_cli_overrides, save_config, to_dict, from_dict
