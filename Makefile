# fontrx build/check targets (the analog of the reference's
# `zig build` / `zig build check`).
.PHONY: check test native bench clean

# compile-only validation of every Python module + the native lib
check: native
	python3 -m compileall -q fontrx tests benchmarks bench.py __graft_entry__.py

native:
	$(MAKE) -C fontrx/native

test: native
	python3 -m pytest tests/ -q

bench: native
	python3 bench.py

clean:
	$(MAKE) -C fontrx/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
