"""CLI entry points mirroring the reference's public surface:
mmrec (train), mmrec_eval (eval-only), mmrec_prefix (transfer)."""
