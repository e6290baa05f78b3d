"""Compatibility entry point mirroring the reference data_prep.py script."""

from vbt_tpu.cli.data_prep import main

if __name__ == "__main__":
    main()
