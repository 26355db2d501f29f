.PHONY: test test-fast test-scale bench bench-all native clean smoke dryrun reproduce

test:        # default tier: everything but the -m scale twins (pyproject addopts)
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m fast

test-scale:  # reference-scale (191k-row) twins; several minutes each
	python -m pytest tests/ -q -m scale

bench:
	python bench.py

bench-all:
	python bench_all.py

bench-stages:
	python bench_all.py --stages

bench-serve:
	python bench_all.py --serve

bench-text:
	python bench_all.py --text

native:
	python -c "from incremental_multimodal_medical_learning_ii_tpu.runtime import build_library; print(build_library(force=True))"

smoke:
	python -m incremental_multimodal_medical_learning_ii_tpu.cli.zero_joint_bounds \
		--synthetic --epochs 1 --batch-size 512 --lr 1e-3 --log-dir /tmp/imml_smoke

dryrun:
	JAX_PLATFORMS=cpu python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

reproduce:
	python -m incremental_multimodal_medical_learning_ii_tpu.cli.reproduce --dry-run

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; \
	rm -f incremental_multimodal_medical_learning_ii_tpu/runtime/libembstore.so
