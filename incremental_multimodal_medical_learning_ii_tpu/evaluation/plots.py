"""Matplotlib figures for TensorBoard.

Covers the reference's full analysis-plot surface: annotated heatmaps with
fixed per-metric value ranges (``HeatMapPlotter.py:7-128``), per-class
ROC / precision-recall curves (``Trainer.py:879-898``), per-class metric
scatter plots (``Trainer.py:192-202``), PCA / t-SNE prompt-embedding plots
(``Trainer.py:1310-1420``), image-embedding t-SNE plots
(``Trainer.py:1074-1185``), and the 10x10 prompt cosine heatmap
(``Trainer.py:1474-1554``).

All functions build and return a figure; callers hand it to the TB writer.
matplotlib uses the Agg backend (no display on TPU hosts).
"""

from __future__ import annotations

from typing import Optional, Sequence

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402


def _detach(fig):
    """Drop the figure from pyplot's global registry before handing it to
    the (buffering) TB writer — it stays renderable through its Agg canvas,
    and dozens of pending figures no longer trip pyplot's open-figure
    warning or pin its registry."""
    plt.close(fig)
    return fig


import numpy as np  # noqa: E402

CLASS_ABBREVIATIONS = ("ATEL", "CMG", "CONS", "EDE", "PLEF")
_TSNE_COLORS_5 = ("#FEB24C", "#F03B20", "#74C476", "#238B8C", "#6A51A3")
_TSNE_COLORS_2 = ("#F03B20", "#74C476")


def heatmap_figure(
    data: np.ndarray,
    row_labels: Sequence[str],
    col_labels: Sequence[str],
    cbarlabel: str,
    metric: str,
    valfmt: str = "{:.2f}",
):
    """Annotated heatmap with the reference's fixed value ranges:
    COS in [-1, 1], F1/AUROC in [0, 1] (HeatMapPlotter.py:36-43)."""
    data = np.asarray(data)
    if metric == "COS":
        vmin, vmax = -1.0, 1.0
    elif metric in ("F1", "AUROC"):
        vmin, vmax = 0.0, 1.0
    else:
        raise ValueError(f"unknown heatmap metric {metric!r}")

    fig, ax = plt.subplots()
    im = ax.imshow(data, vmin=vmin, vmax=vmax, cmap="YlGn")
    cbar = ax.figure.colorbar(im, ax=ax)
    cbar.ax.set_ylabel(cbarlabel, rotation=-90, va="bottom")
    ax.set_xticks(np.arange(data.shape[1]), labels=list(col_labels))
    ax.set_yticks(np.arange(data.shape[0]), labels=list(row_labels))
    ax.tick_params(top=True, bottom=False, labeltop=True, labelbottom=False)
    plt.setp(ax.get_xticklabels(), rotation=-30, ha="right", rotation_mode="anchor")
    ax.spines[:].set_visible(False)
    ax.set_xticks(np.arange(data.shape[1] + 1) - 0.5, minor=True)
    ax.set_yticks(np.arange(data.shape[0] + 1) - 0.5, minor=True)
    ax.grid(which="minor", color="w", linestyle="-", linewidth=3)
    ax.tick_params(which="minor", bottom=False, left=False)

    # annotations, color switched at the midpoint of the range
    threshold = im.norm(float(np.nanmax(data))) / 2.0
    for i in range(data.shape[0]):
        for j in range(data.shape[1]):
            color = "white" if im.norm(data[i, j]) > threshold else "black"
            ax.text(j, i, valfmt.format(data[i, j]), ha="center", va="center", color=color)
    fig.tight_layout()
    return _detach(fig)


def roc_curve_figure(y_true: np.ndarray, y_score: np.ndarray, class_index: int):
    from sklearn.metrics import roc_auc_score, roc_curve

    fpr, tpr, _ = roc_curve(y_true, y_score)
    auc = roc_auc_score(y_true, y_score)
    fig = plt.figure()
    plt.plot(fpr, tpr, label="AUC = {:.3f}".format(auc))
    plt.xlabel("False Positive Rate")
    plt.ylabel("True Positive Rate")
    plt.title("ROC Curve for Class " + str(class_index))
    plt.legend(loc="lower right")
    return _detach(fig)


def pr_curve_figure(y_true: np.ndarray, y_score: np.ndarray, class_index: int):
    from sklearn.metrics import average_precision_score, precision_recall_curve

    precision, recall, _ = precision_recall_curve(y_true, y_score)
    ap = average_precision_score(y_true, y_score)
    fig = plt.figure()
    plt.plot(recall, precision, label="AP = {:.3f}".format(ap))
    plt.xlabel("Recall")
    plt.ylabel("Precision")
    plt.title("Precision-Recall Curve for Class " + str(class_index))
    plt.legend(loc="lower left")
    return _detach(fig)


def class_scatter_figure(values: np.ndarray, metric: str):
    """Per-class metric scatter (Trainer.py:192-202; x axis is mislabeled
    'Epoch' in the reference — kept for tag/visual parity)."""
    fig = plt.figure()
    plt.scatter(np.arange(1, len(values) + 1), values)
    plt.xlabel("Epoch")
    plt.ylabel(metric)
    plt.ylim(0, 1)
    plt.title("Class " + metric)
    return _detach(fig)


def prompt_cosine_heatmap_figure(
    pos_embs: np.ndarray,
    neg_embs: Optional[np.ndarray],
    single_prompt: bool,
):
    """10x10 (or 5x5 pos-only) prompt cosine heatmap (Trainer.py:1474-1554).

    ``pos_embs`` / ``neg_embs``: (C, D) adapted *mean* prompt embeddings
    (the reference plots always use the mean, even in MAX mode:
    ``bert_forward_mean(..., to_plot=True)``).
    """

    def _cos(a, b):
        an = a / max(np.linalg.norm(a), 1e-8)
        bn = b / max(np.linalg.norm(b), 1e-8)
        return float(an @ bn)

    c = pos_embs.shape[0]
    if neg_embs is None:
        labels = [f"{a}-pos" for a in CLASS_ABBREVIATIONS[:c]]
        data = np.zeros((c, c))
        for i in range(c):
            for j in range(c):
                data[i, j] = _cos(pos_embs[i], pos_embs[j])
    else:
        labels = []
        for a in CLASS_ABBREVIATIONS[:c]:
            labels += [f"{a}-pos", f"{a}-neg"]
        stacked = np.empty((2 * c, pos_embs.shape[1]), pos_embs.dtype)
        stacked[0::2] = pos_embs
        stacked[1::2] = neg_embs
        data = np.zeros((2 * c, 2 * c))
        for i in range(2 * c):
            for j in range(2 * c):
                data[i, j] = _cos(stacked[i], stacked[j])
    str_prompts = "-single-prompt" if single_prompt else "-multiple-prompts"
    return heatmap_figure(
        data, labels, labels, "Cosine similarity heatmap" + str_prompts, "COS"
    )


def prompt_projection_figures(
    pos_embs: np.ndarray, neg_embs: Optional[np.ndarray], seed: int = 27
):
    """PCA + t-SNE scatter of the adapted mean prompt embeddings
    (Trainer.py:1310-1420). Returns (pca_fig, tsne_fig).  ``neg_embs=None``
    plots positives only (pos-only analyses have no real negatives to
    show — the bank's mirrored ones are duplicates)."""
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE

    c = pos_embs.shape[0]
    if neg_embs is None:
        embs = np.asarray(pos_embs)
        shapes = ["o"] * c
        colors = list(["r", "g", "b", "c", "m"][:c])
        polarity_handles = (("o", "Positive"),)
    else:
        embs = np.empty((2 * c, pos_embs.shape[1]), pos_embs.dtype)
        embs[0::2] = pos_embs
        embs[1::2] = neg_embs
        shapes = ["o", "v"] * c
        group_colors = ["r", "g", "b", "c", "m"]
        colors = [group_colors[i // 2] for i in range(2 * c)]
        polarity_handles = (("o", "Positive"), ("v", "Negative"))
    n = len(embs)

    def _scatter(reduced, title):
        fig = plt.figure()
        for i in range(n):
            plt.scatter(reduced[i, 0], reduced[i, 1], marker=shapes[i], c=colors[i])
        plt.title(title)
        # only the classes actually plotted (c may be < 5)
        legend_categories = dict(
            list(zip(["r", "g", "b", "c", "m"], CLASS_ABBREVIATIONS))[:c]
        )
        handles = [
            plt.Line2D([0], [0], marker="o", color="w", label=cat, markerfacecolor=col, markersize=10)
            for col, cat in legend_categories.items()
        ]
        handles += [
            plt.Line2D([0], [0], marker=m, color="w", label=lbl, markerfacecolor="k", markersize=10)
            for m, lbl in polarity_handles
        ]
        plt.legend(handles=handles)
        return _detach(fig)

    pca_fig = _scatter(PCA(n_components=2).fit_transform(embs), "PCA multiple-prompts")
    perplexity = max(1.0, min(30.0, (n - 1) / 3))  # sklearn rejects 0 (n<=1 banks)
    tsne = TSNE(
        n_components=2, metric="cosine", init="pca", learning_rate="auto",
        perplexity=perplexity, random_state=seed,
    )
    tsne_fig = _scatter(tsne.fit_transform(embs), "TSNE multiple-prompts")
    return pca_fig, tsne_fig


def embedding_tsne_figure(
    embeddings: np.ndarray,
    labels: np.ndarray,
    kind: str,
    seed: int = 27,
):
    """t-SNE of adapted image embeddings (Trainer.py:1074-1185).

    kind='multiclass': color by argmax label (5 single-positive groups).
    kind='sani-malati': color healthy (all-0) vs all-diseased (all-1).
    """
    from sklearn.manifold import TSNE

    if kind == "multiclass":
        colors = [_TSNE_COLORS_5[int(np.argmax(l))] for l in labels]
        legend = dict(zip(CLASS_ABBREVIATIONS, _TSNE_COLORS_5))
    elif kind == "sani-malati":
        group = (labels.sum(axis=1) / labels.shape[1]).astype(int)
        colors = [_TSNE_COLORS_2[g] for g in group]
        legend = dict(zip(("NF", "DS"), _TSNE_COLORS_2))
    else:
        raise ValueError(kind)

    perplexity = min(30.0, max(1.0, (len(embeddings) - 1) / 3))
    tsne = TSNE(
        n_components=2, metric="cosine", init="pca", learning_rate="auto",
        perplexity=perplexity, random_state=seed,
    )
    reduced = tsne.fit_transform(embeddings)
    fig = plt.figure()
    plt.scatter(reduced[:, 0], reduced[:, 1], c=colors, s=25, alpha=0.7)
    patches = [plt.Rectangle((0, 0), 1, 1, color=c) for c in legend.values()]
    plt.legend(patches, legend.keys())
    plt.xticks([])
    plt.yticks([])
    plt.title("t-SNE Plot", fontsize=20)
    return _detach(fig)


def label_pattern_frequency_figure(pattern_counts, class_names: Sequence[str],
                                   title: str = "Pattern Frequencies"):
    """Bar plot of multi-hot label-pattern frequencies — the reference's
    ``faq-patterns/{train,val,test}_patterns.png`` artifacts
    (``CSV_reformatting/count_pos_neg_V2.py:20-47``): x labels join each
    pattern's positive-class abbreviations with '+' (empty string for the
    all-negative pattern), y is the pattern's fraction of the dataset,
    sorted most-frequent first.

    ``pattern_counts``: the Counter from
    ``ChexpertManifest.label_pattern_counts()`` (or any {tuple: count}).
    """
    class_names = list(class_names)
    # the reference's 5 competition classes keep their canonical short
    # forms; any other label set falls back to prefix abbreviations
    if len(class_names) == len(CLASS_ABBREVIATIONS) and class_names[0] == "Atelectasis":
        abbr = CLASS_ABBREVIATIONS
    else:
        abbr = tuple(n[:4].upper() for n in class_names)
    for pat in pattern_counts:
        if len(pat) != len(class_names):
            raise ValueError(
                f"pattern of length {len(pat)} vs {len(class_names)} classes"
            )
    total = sum(pattern_counts.values()) or 1
    items = sorted(pattern_counts.items(), key=lambda kv: -kv[1])
    abbrevs = [
        "+".join(abbr[i] for i, v in enumerate(pat) if v)
        for pat, _ in items
    ]
    freqs = [cnt / total for _, cnt in items]
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.bar(range(len(freqs)), freqs)
    ax.set_xticks(range(len(freqs)))
    ax.set_xticklabels(abbrevs, rotation=90)
    ax.set_title(title)
    ax.set_xlabel("Condition Combinations")
    ax.set_ylabel("Frequency")
    fig.tight_layout()
    return _detach(fig)
