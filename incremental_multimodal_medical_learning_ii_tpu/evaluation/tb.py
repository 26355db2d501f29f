"""TensorBoard logging with the reference's exact tag schema.

Scalar tags (see SURVEY.md section 5 / ``Trainer.py``):
  train/Loss, train/LR, val/Loss,
  {val,test}/Accuracy, {val,test}/F1-macro score, {val,test}/F1-weighted score,
  {val,test}/AUROC-macro, {val,test}/AUROC-weighted,
  monitor-resets/{resets,updates,percentage resets,threshold-scheduling},
  max-mean-comparison/{pos,neg}
Figure tags:
  "{val,test} ROC Curve/Curve for Class {i}",
  "{val,test} Precision-Recall Curve/Curve for Class {i}",
  "{val,test} Class-metric/Class {Accuracy,Precision,Recall}",
  "{val,test}/joint train/{F1,AUROC} score Heatmap",
  "{val,test}/{mode} incremental/{F1,AUROC} score Heatmap",
  "visual-embeddings/{PCA,t-SNE} text-embs",
  "visual-embeddings/cosine-similarity Heatmap text-embs",
  "tsne-chexpert/t-SNE {5x1000,sani-malati}"

The writer is a thin optional wrapper: pass ``log_dir=None`` for a no-op
writer (tests / benchmarking).

Events are buffered in memory and only hit the event file on
:meth:`commit` (called by the protocols at every unit checkpoint and on
clean close); :meth:`discard` drops the buffer.  This makes TB output
*unit-atomic* for crash-resume: a crashed attempt leaves no partial-unit
events behind, so a resumed run's merged event stream byte-matches an
uninterrupted run's (torch's SummaryWriter flushes its queue at
nondeterministic points, which would leak a random prefix of the crashed
unit into the file).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


class TBWriter:
    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        self._writer = None
        self._pending: List[Tuple[str, str, object, int]] = []

    @property
    def enabled(self) -> bool:
        return self.log_dir is not None

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self.enabled:
            self._pending.append(("scalar", tag, float(value), step))

    def add_figure(self, tag: str, figure, step: int = 0) -> None:
        if self.enabled:
            self._pending.append(("figure", tag, figure, step))
        else:  # still release the figure
            import matplotlib.pyplot as plt

            plt.close(figure)

    def commit(self) -> None:
        """Write all buffered events to the event file and flush."""
        if not self.enabled:
            return
        if self._writer is None:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(self.log_dir)
        # pop as written: if an event raises mid-commit (figure render, IO),
        # already-written events must NOT stay buffered — a retried commit
        # would duplicate them, breaking the byte-match resume guarantee
        while self._pending:
            kind, tag, payload, step = self._pending[0]
            if kind == "scalar":
                self._writer.add_scalar(tag, payload, step)
            else:
                self._writer.add_figure(tag, payload, step)
            self._pending.pop(0)
        self._writer.flush()

    def discard(self) -> None:
        """Drop buffered events (crash path: the unit they belong to was
        not checkpointed and will be re-run on resume)."""
        import matplotlib.pyplot as plt

        for kind, _tag, payload, _step in self._pending:
            if kind == "figure":
                plt.close(payload)
        self._pending = []

    def flush(self) -> None:
        self.commit()

    def close(self) -> None:
        self.commit()
        if self._writer is not None:
            self._writer.close()
