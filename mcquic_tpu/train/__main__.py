"""`python -m mcquic_tpu.train config.yaml` shim (reference mcquic/train/__main__.py)."""
import sys

from mcquic_tpu.train.cli import main

if __name__ == "__main__":
    main(sys.argv[1], resume="-r" in sys.argv, gen="-G" in sys.argv)
