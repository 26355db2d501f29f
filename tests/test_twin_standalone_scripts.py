"""Twin-run parity for the reference's STANDALONE analysis scripts.

``text_prompts_cosine_similarity.py`` and ``plot_text_emebeddings.py`` are
the two L5 scripts a reference user runs directly (SURVEY.md component 18);
the Trainer twins never execute them.  Here ``runpy`` runs each script's
``__main__`` block for real — with the vendored text stack as its encoder
(the ``get_cxr_bert_inference`` dispatch) — and the resulting module
globals (the 10x10 cosine matrix, the stacked prompt-embedding array) are
compared against the framework's analyze-prompts path
(text/bank.py + evaluation/plots.py).

sklearn>=1.2 refuses 10-sample t-SNE (perplexity default 30), so
``plot_text_emebeddings.py``'s t-SNE call gets the same figure-only
substitute the Trainer twins use; everything compared numerically comes
from before that call.
"""

from __future__ import annotations

import runpy
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_twin import (  # noqa: E402
    REF_DIR,
    _VisualTSNE,
    _install_stubs,
    real_text_stack,
)

CLASS_NAMES = ["Atelectasis", "Cardiomegaly", "Consolidation", "Edema", "Pleural Effusion"]


def _run_reference_script(name: str, tmp_path, patch_tsne: bool = False):
    """Execute /root/reference/<name> as __main__ with the vendored text
    stack live; returns (script globals, framework encode_fn)."""
    import matplotlib

    matplotlib.use("Agg")
    _install_stubs()
    # the scripts import `from health_multimodal.text.utils import
    # get_cxr_bert_inference` (not the package root the Trainer uses)
    from reference_twin import _stub_module, _text_engine_factory

    if "health_multimodal.text.utils" not in sys.modules:
        utils = _stub_module("health_multimodal.text.utils")
        utils.get_cxr_bert_inference = lambda: _text_engine_factory[0]()
        sys.modules["health_multimodal.text.utils"] = utils
        sys.modules["health_multimodal.text"].utils = utils
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    with real_text_stack(tmp_path) as (encode_fn, _engine):
        if patch_tsne:
            import sklearn.manifold

            orig = sklearn.manifold.TSNE
            sklearn.manifold.TSNE = _VisualTSNE
        try:
            result = runpy.run_path(f"{REF_DIR}/{name}", run_name="__main__")
        finally:
            if patch_tsne:
                sklearn.manifold.TSNE = orig
    return result, encode_fn


def _framework_mean_prompt_embeddings(encode_fn):
    """The framework's analyze-prompts path: template bank -> PromptBank ->
    masked mean (cli/analyze_prompts.py:60-131)."""
    from incremental_multimodal_medical_learning_ii_tpu.ops.cosine import masked_mean
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import (
        create_prompts,
    )

    prompts = create_prompts(CLASS_NAMES)
    bank = build_prompt_bank(encode_fn, prompts, CLASS_NAMES)
    pos = np.asarray(masked_mean(bank.pos, bank.pos_count))
    neg = np.asarray(masked_mean(bank.neg, bank.neg_count))
    return pos, neg


def test_pin_heatmap_metric_crash():
    """PINS REFERENCE BEHAVIOR: the author's modified HeatMapPlotter.heatmap
    raises a bare Exception unless metric is 'COS'/'F1'/'AUROC'
    (HeatMapPlotter.py:7-70, 'my fix to set limit'), and
    text_prompts_cosine_similarity.py:114-117 calls it WITHOUT metric — the
    standalone script crashes at its final plot as committed.  The twin
    below injects metric='COS' at the renderer boundary to let the script
    complete; this test pins the unpatched crash."""
    import importlib

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _install_stubs()
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    hm = importlib.import_module("HeatMapPlotter")
    fig, ax = plt.subplots()
    try:
        with pytest.raises(Exception):
            hm.heatmap(np.zeros((2, 2)), ["a", "b"], ["a", "b"], ax=ax,
                       cbarlabel="Cosine similarity heatmap multiple-prompts")
    finally:
        plt.close(fig)


@pytest.mark.slow
def test_twin_text_prompts_cosine_script(tmp_path):
    """text_prompts_cosine_similarity.py:49-118 executes end to end (with
    metric='COS' injected at the heatmap renderer boundary — see the crash
    pin above); its 10x10 interleaved pos/neg cosine matrix equals the
    framework's prompt_cosine_heatmap_figure input matrix (captured at the
    heatmap_figure renderer boundary, like the Trainer figure twins)."""
    import importlib

    from incremental_multimodal_medical_learning_ii_tpu.evaluation import plots

    _install_stubs()
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    hm = importlib.import_module("HeatMapPlotter")
    orig_heatmap = hm.heatmap
    ref_captured = []

    def ref_capture(data, row_labels, col_labels, **kw):
        ref_captured.append(np.array(data, np.float64))
        kw["metric"] = "COS"
        return orig_heatmap(data, row_labels, col_labels, **kw)

    hm.heatmap = ref_capture
    try:
        result, encode_fn = _run_reference_script(
            "text_prompts_cosine_similarity.py", tmp_path
        )
    finally:
        hm.heatmap = orig_heatmap
    assert len(ref_captured) == 1
    ref_matrix = np.asarray(result["heat_map"], np.float64)
    assert ref_matrix.shape == (10, 10)
    assert result["abbrevviations"][0] == "ATEL-pos"

    pos, neg = _framework_mean_prompt_embeddings(encode_fn)
    captured = []
    orig = plots.heatmap_figure

    def capture(data, rows, cols, cbarlabel, metric, *a, **kw):
        captured.append(np.array(data, np.float64))
        return orig(data, rows, cols, cbarlabel, metric, *a, **kw)

    plots.heatmap_figure = capture
    try:
        fig = plots.prompt_cosine_heatmap_figure(pos, neg, single_prompt=False)
    finally:
        plots.heatmap_figure = orig
    import matplotlib.pyplot as plt

    plt.close(fig)
    assert len(captured) == 1
    np.testing.assert_allclose(captured[0], ref_matrix, atol=2e-5)
    # the diagonal is self-cosine == 1
    np.testing.assert_allclose(np.diag(ref_matrix), np.ones(10), atol=1e-5)


@pytest.mark.slow
def test_twin_plot_text_embeddings_script(tmp_path):
    """plot_text_emebeddings.py:57-127 executes end to end (PCA + patched
    t-SNE); its stacked (10, 128) normalized mean-prompt array — the input
    every downstream plot reduces — equals the framework bank's."""
    result, encode_fn = _run_reference_script(
        "plot_text_emebeddings.py", tmp_path, patch_tsne=True
    )
    ref_stack = result["embeddings"].numpy()
    assert ref_stack.shape == (10, 128)

    pos, neg = _framework_mean_prompt_embeddings(encode_fn)
    pos = pos / np.maximum(np.linalg.norm(pos, axis=1, keepdims=True), 1e-12)
    neg = neg / np.maximum(np.linalg.norm(neg, axis=1, keepdims=True), 1e-12)
    fw_stack = np.empty_like(ref_stack)
    fw_stack[0::2] = pos
    fw_stack[1::2] = neg
    np.testing.assert_allclose(fw_stack, ref_stack, atol=2e-5)
    # the script's PCA ran on exactly this input and produced 2-D points
    assert np.asarray(result["reduced_embeddings"]).shape == (10, 2)
