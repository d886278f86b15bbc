# Developer entry points

.PHONY: test test-fast bench smoke-train smoke-val native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_schedules.py tests/test_sampler.py \
	  tests/test_ms_deform_attn.py tests/test_spotter.py -q

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
