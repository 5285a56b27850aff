.PHONY: native test bench clean

native:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf build raweditor_tpu/native/*.so raweditor_tpu/native/*.o
