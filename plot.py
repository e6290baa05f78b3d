"""Compatibility entry point mirroring the reference plot.py CLI."""

from vbt_tpu.cli.plot import main

if __name__ == "__main__":
    main()
