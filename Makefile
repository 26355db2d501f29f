.PHONY: test bench native clean smoke

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	python -c "from incremental_multimodal_medical_learning_ii_tpu.runtime import build_library; print(build_library(force=True))"

smoke:
	python -m incremental_multimodal_medical_learning_ii_tpu.cli.zero_joint_bounds \
		--synthetic --epochs 1 --batch-size 512 --lr 1e-3 --log-dir /tmp/imml_smoke

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; \
	rm -f incremental_multimodal_medical_learning_ii_tpu/runtime/libembstore.so
