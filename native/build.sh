#!/bin/sh
# Build the native scorer/tokenizer shared library.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libopenviic_native.so openviic_native.cpp
g++ -O2 -shared -fPIC -std=c++17 -o librdr_segmenter.so rdr_segmenter.cpp
echo "built native/libopenviic_native.so + librdr_segmenter.so"
