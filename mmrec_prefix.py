"""Root shim: `python mmrec_prefix.py ...` == reference CLI surface."""
from unimp_tpu.cli.mmrec_prefix import main

if __name__ == "__main__":
    main()
