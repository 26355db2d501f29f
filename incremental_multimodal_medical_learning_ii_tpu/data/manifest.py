"""CheXpert CSV manifests.

Covers the reference's CSV handling: ``CustomDataset`` label extraction
(``DataRetrieval.py:70-96``: first column is the image path, label columns
are the 5 competition tasks as float 0/1) and the ``CSV_reformatting``
utilities (NA handling, frontal filtering, all-negative-row removal,
label-pattern counting).
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd

from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS,
)


class ChexpertManifest:
    """A CSV of image paths + multi-hot labels."""

    def __init__(
        self,
        frame: pd.DataFrame,
        img_dir: str | Path = "",
        label_names: Sequence[str] = CHEXPERT_COMPETITION_TASKS,
    ):
        self.frame = frame.reset_index(drop=True)
        self.img_dir = str(img_dir)
        self.label_names = list(label_names)

    @classmethod
    def from_csv(
        cls,
        csv_path: str | Path,
        img_dir: str | Path = "",
        label_names: Sequence[str] = CHEXPERT_COMPETITION_TASKS,
    ) -> "ChexpertManifest":
        return cls(pd.read_csv(csv_path), img_dir, label_names)

    def __len__(self) -> int:
        return len(self.frame)

    def image_path(self, idx: int) -> str:
        # reference: str(img_dir) + str(first CSV column) (DataRetrieval.py:87)
        return self.img_dir + str(self.frame.iloc[idx, 0])

    def image_paths(self) -> List[str]:
        return [self.img_dir + str(p) for p in self.frame.iloc[:, 0]]

    def labels(self) -> np.ndarray:
        return self.frame.loc[:, self.label_names].to_numpy(dtype=np.float32)

    # ------------------------------------------------------------------
    # CSV_reformatting equivalents
    # ------------------------------------------------------------------
    def dropna_labels(self) -> "ChexpertManifest":
        """Drop rows with NA in any label column (remove_NA.py:40-51)."""
        return ChexpertManifest(
            self.frame.dropna(subset=self.label_names), self.img_dir, self.label_names
        )

    def filter_frontal(self, column: str = "Frontal/Lateral", value: str = "Frontal") -> "ChexpertManifest":
        """Keep frontal views only."""
        if column not in self.frame.columns:
            # CheXpert encodes the view in the path when no column exists
            mask = self.frame.iloc[:, 0].astype(str).str.contains("frontal", case=False)
            return ChexpertManifest(self.frame[mask], self.img_dir, self.label_names)
        return ChexpertManifest(
            self.frame[self.frame[column] == value], self.img_dir, self.label_names
        )

    def remove_all_negative(self) -> "ChexpertManifest":
        """Drop rows whose 5 labels are all zero (new_test_set_senza sani.py)."""
        keep = self.labels().sum(axis=1) > 0
        return ChexpertManifest(self.frame[keep], self.img_dir, self.label_names)

    def label_pattern_counts(self) -> Counter:
        """Frequency of each multi-hot pattern (count_pos_neg_in_csv.py)."""
        return Counter(tuple(int(v) for v in row) for row in self.labels())

    def positive_counts(self) -> np.ndarray:
        return self.labels().sum(axis=0)

    def split(self, first_n: int) -> Tuple["ChexpertManifest", "ChexpertManifest"]:
        """Contiguous head/tail split (splitTrainingEmbedding.py:17-29)."""
        return (
            ChexpertManifest(self.frame.iloc[:first_n], self.img_dir, self.label_names),
            ChexpertManifest(self.frame.iloc[first_n:], self.img_dir, self.label_names),
        )
