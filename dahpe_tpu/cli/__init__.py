"""Command-line entry points (``python -m dahpe_tpu.cli.train`` / ``.test``)."""
