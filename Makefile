check:
	python selfcheck.py

test:
	python -m pytest tests/ -x -q

# Same coverage split across 6 worker processes (see partest.py);
# ~3x faster wall on a 32-core box.
test-par:
	python partest.py

bench:
	python bench.py
