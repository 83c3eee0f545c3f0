"""Entry points mirroring the reference scripts.

  python -m prifit_tpu.cli.train_partseg   <-> train_partseg_shapenet.py
  python -m prifit_tpu.cli.pretrain_partseg <-> pretrain_partseg_shapenet.py
  python -m prifit_tpu.cli.testing         <-> testing.py
  python -m prifit_tpu.cli.fitting         <-> fitting.py

Flags are reference-compatible (``args_parser.parse_args``).
"""
