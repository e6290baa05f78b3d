"""Compatibility entry point mirroring the reference eval.py CLI."""

from vbt_tpu.cli.eval import main

if __name__ == "__main__":
    main()
