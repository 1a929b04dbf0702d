.PHONY: test bench dist clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

dist:
	python -c "from ehr_ner_spark.pyfiles import build_zip; print(build_zip('dist'))"

clean:
	rm -rf dist .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
