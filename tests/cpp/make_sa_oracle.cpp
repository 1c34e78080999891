// Oracle: produce a reference-format ".sa" side file (FMIndex::saveSamples,
// FMIndex.cpp:125-147) from a .fmi index, for differential testing of the
// fmi_compat .sa loader.  Build (needs the reference compiled at $DSM_REF_BIN):
//   g++ -O2 -I$REF -I$REF/libcds/includes -o make_sa_oracle \
//       make_sa_oracle.cpp $REF/{FMIndex,HuffWT,BitRank,Tools,TextCollection,\
//       TextStorage,ResultSet}.o $REF/libcds/lib/libcds.a $REF/incbwt/rlcsa.a
// Usage: make_sa_oracle <base>   # loads <base>.fmi, writes <base>.sa
#include "FMIndex.h"
#include <cstdio>

int main(int argc, char** argv) {
    if (argc != 2) { std::fprintf(stderr, "usage: %s <base>\n", argv[0]); return 1; }
    FMIndex fmi(argv[1], "");
    fmi.saveSamples(argv[1]);
    return 0;
}
