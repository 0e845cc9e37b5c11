"""Pipeline layer: config, temp-file scheme, orchestration, reporting."""
