"""Compatibility entry point mirroring the reference track.py CLI."""

from vbt_tpu.cli.track import main

if __name__ == "__main__":
    main()
