# Developer entry points

.PHONY: test test-fast bench smoke-train smoke-val native clean

# full suite: ~60-75 min on an 8-CPU virtual mesh (the joint/train-step/
# parity tests each compile multi-model graphs). Use test-fast (~5 min) for
# inner-loop work and test-parity to re-anchor against the reference.
test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_schedules.py tests/test_sampler.py \
	  tests/test_ms_deform_attn.py tests/test_spotter.py \
	  tests/test_jv_matcher.py tests/test_text_eval_oracle.py -q

test-parity:
	python -m pytest tests/test_ref_forward_parity.py \
	  tests/test_ref_testr_parity.py tests/test_ref_diffusion_parity.py \
	  tests/test_weights.py -q

bench:
	python bench.py

smoke-train:
	python train.py --config configs/train_smoke.yaml

smoke-val:
	python val.py --config configs/val_smoke.yaml --image-size 64

native:
	$(MAKE) -C native

clean:
	rm -rf runs results pytest_child.log
	$(MAKE) -C native clean
