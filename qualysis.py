"""Compatibility entry point mirroring the reference qualysis.py CLI."""

from vbt_tpu.cli.qualisys import main

if __name__ == "__main__":
    main()
