"""Root shim: `python mmrec_eval.py ...` == reference CLI surface."""
from unimp_tpu.cli.mmrec_eval import main

if __name__ == "__main__":
    main()
