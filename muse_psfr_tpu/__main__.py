"""``python -m muse_psfr_tpu`` runs the ``muse-psfr`` CLI."""

from .cli import main

if __name__ == "__main__":
    main()
