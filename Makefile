check:
	python selfcheck.py

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py
