"""Root shim: `python mmrec.py ...` == reference CLI surface."""
from unimp_tpu.cli.mmrec import main

if __name__ == "__main__":
    main()
