# Native kernel build (the Python side also builds lazily on first use;
# this gives explicit + sanitizer builds).
#
# Targets:
#   make            release build of the GFPush kernel
#   make tsan       ThreadSanitizer build (race detection for the OpenMP
#                   kernel; the reference ships no sanitizer config at all)
#   make asan       AddressSanitizer build
#   make test       run the python test suite
#   make clean

CXX      ?= g++
SRC      := grandtpu/ppr/csrc/gfpush.cpp
OUT      := build/libgfpush.so
CXXFLAGS := -O3 -std=c++17 -shared -fPIC -fopenmp -march=native -funroll-loops

all: $(OUT)

$(OUT): $(SRC)
	mkdir -p build
	$(CXX) $(CXXFLAGS) $(SRC) -o $(OUT)

TEST_SRC := grandtpu/ppr/csrc/gfpush_test.cpp

tsan: $(SRC) $(TEST_SRC)
	mkdir -p build
	$(CXX) -O1 -g -std=c++17 -fopenmp -fsanitize=thread \
	    $(SRC) $(TEST_SRC) -o build/gfpush_tsan

tsan-check: tsan
	# libgomp is not TSAN-instrumented: reads after the implicit parallel
	# barrier are false positives, suppressed by file; kernel-internal
	# worker-vs-worker races in gfpush.cpp still fire
	TSAN_OPTIONS="halt_on_error=1 suppressions=grandtpu/ppr/csrc/tsan.supp" ./build/gfpush_tsan

asan: $(SRC) $(TEST_SRC)
	mkdir -p build
	$(CXX) -O1 -g -std=c++17 -fopenmp -fsanitize=address \
	    $(SRC) $(TEST_SRC) -o build/gfpush_asan

asan-check: asan
	./build/gfpush_asan

test:
	python -m pytest tests/ -q

clean:
	rm -rf build

.PHONY: all tsan tsan-check asan asan-check test clean
