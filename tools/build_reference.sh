#!/bin/sh
# Build the golden_dump tool against the READ-ONLY reference sources.
# Dev-only: the reference (/root/reference) is the conformance oracle;
# nothing it builds ships with the engine. Output lands in /tmp/refbuild.
#
# The reference needs a generated acconfig.h (autotools is absent here),
# utf8.c is #included by string.c (not compiled standalone), and
# getruntime.c duplicates a symbol in times.c on this platform.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/refbuild}
mkdir -p "$OUT"
sed -e 's/#undef \(HAVE_[A-Z0-9_]*\)/#define \1 1/' \
    -e 's/#undef PACKAGE_\(.*\)/#define PACKAGE_\1 "libswish3"/' \
    -e 's/#undef PACKAGE$/#define PACKAGE "libswish3"/' \
    -e 's/#undef VERSION/#define VERSION "1.0.0"/' \
    -e 's/#undef SVN_REVISION/#define SVN_REVISION "0"/' \
    -e 's/#undef STDC_HEADERS/#define STDC_HEADERS 1/' \
    -e 's/#undef LT_OBJDIR/#define LT_OBJDIR ".libs"/' \
    "$REF/src/acconfig.h.in" \
  | sed 's/#define HAVE_XAPIAN 1/#undef HAVE_XAPIAN/' > "$OUT/acconfig.h"

SRCS=$(ls "$REF"/src/libswish3/*.c | grep -v -e utf8.c -e getruntime.c)
CFLAGS="-O2 -w -I$OUT -I$REF/src/libswish3 -I/usr/include/libxml2"
LIBS="-L/usr/lib/x86_64-linux-gnu -lxml2 -lz -lm"

gcc $CFLAGS -o "$OUT/swish_lint" "$REF/src/swish_lint.c" $SRCS $LIBS
gcc $CFLAGS -o "$OUT/swish_tokenize" "$REF/src/swish_tokenize.c" $SRCS $LIBS
gcc $CFLAGS -o "$OUT/golden_dump" "$(dirname "$0")/golden_dump.c" $SRCS $LIBS
gcc $CFLAGS -o "$OUT/scalar_dump" "$(dirname "$0")/scalar_dump.c" $SRCS $LIBS
gcc $CFLAGS -o "$OUT/swish_isw" "$REF/src/swish_isw.c" $SRCS $LIBS
gcc $CFLAGS -o "$OUT/token_dump" "$(dirname "$0")/token_dump.c" $SRCS $LIBS
echo "built: $OUT/swish_lint $OUT/swish_tokenize $OUT/golden_dump $OUT/scalar_dump $OUT/swish_isw $OUT/token_dump"
echo "run goldens with LC_ALL=C.utf8 (authoritative locale on this container)"
