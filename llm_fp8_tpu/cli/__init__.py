"""CLI entry points: python -m llm_fp8_tpu.cli.train / .serve"""
