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
"""

from __future__ import annotations

from typing import Optional


class TBWriter:
    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        self._writer = None
        if log_dir is not None:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir)

    @property
    def enabled(self) -> bool:
        return self._writer is not None

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    def add_figure(self, tag: str, figure, step: int = 0) -> None:
        if self._writer is not None:
            self._writer.add_figure(tag, figure, step)
        else:  # still release the figure
            import matplotlib.pyplot as plt

            plt.close(figure)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
