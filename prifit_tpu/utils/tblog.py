"""TensorBoard scalar logging for the trainers.

The reference logs per-epoch/per-iteration scalars via ``tensorboard_logger``
(``train_partseg_shapenet.py:170,477-480``,
``pretrain_partseg_shapenet.py:363-368,402,425,456-457``).  This mirrors
that surface with ``tensorboardX`` event files (readable by standard
TensorBoard), alongside the machine-readable ``metrics.jsonl`` each run
already writes.  Degrades to a no-op when tensorboardX is unavailable.
"""

from typing import Optional


class ScalarWriter:
    """``log_value``-style scalar writer backed by tensorboardX.

    Args:
        logdir: event-file directory (the run's experiment dir, like the
            reference's ``configure(log_dir)``).  None disables writing.
    """

    def __init__(self, logdir: Optional[str]):
        self._writer = None
        if logdir is None:
            return
        try:
            from tensorboardX import SummaryWriter
        except ImportError:      # tensorboard logging is best-effort
            return
        self._writer = SummaryWriter(logdir=logdir)

    def scalar(self, name: str, value, step: int) -> None:
        """Log one scalar (reference ``log_value(name, value, step)``)."""
        if self._writer is not None:
            self._writer.add_scalar(name, float(value), int(step))

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None
