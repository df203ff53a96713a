"""``python -m variant_load_pipeline_spark --tool <Name> ...`` — the
Manager.java-parity entrypoint (see cli.py)."""

from .cli import main

main()
