"""Compatibility entry point mirroring the reference kinovea.py CLI."""

from vbt_tpu.cli.kinovea import main

if __name__ == "__main__":
    main()
