"""Entry-point scripts (same names and --config_path flag surface as the
reference's repo-root run_*.py scripts; invoke as
`python -m ldm_tf2_tpu.cli.<name> --config_path config.yaml`)."""
