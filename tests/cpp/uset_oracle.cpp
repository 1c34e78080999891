// Ground-truth oracle for the libstdc++ unordered_set<unsigned> iteration
// order that dsm_tpu/mining/gnuorder.py models.  The reference metaserver
// iterates `readerset` (unordered_set<unsigned>, metaserver.cpp:23) when
// accumulating entropy and printing "id:occs" pairs, so byte-exact output
// parity requires reproducing this exact hashtable behaviour.
//
// Protocol (stdin, one op per line):
//   n            start a fresh set
//   i <k>        insert k
//   d            dump: print "o <bucket_count> k0 k1 ..." (iteration order)
//   q            quit
#include <cstdio>
#include <unordered_set>

int main() {
    std::unordered_set<unsigned> s;
    char op;
    while (std::scanf(" %c", &op) == 1) {
        if (op == 'n') {
            s = std::unordered_set<unsigned>();
        } else if (op == 'i') {
            unsigned k;
            if (std::scanf("%u", &k) != 1) return 1;
            s.insert(k);
        } else if (op == 'd') {
            std::printf("o %zu", s.bucket_count());
            for (unsigned k : s) std::printf(" %u", k);
            std::printf("\n");
            std::fflush(stdout);
        } else if (op == 'q') {
            break;
        } else {
            return 1;
        }
    }
    return 0;
}
