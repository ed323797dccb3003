// Golden-vector dumper: runs the UNMODIFIED reference library (headers/sources
// included from /root/reference, read-only) with pinned srand seeds and fixed
// key indices, and dumps ciphertext words / permutations / decrypt results as
// JSON.  The recipe follows SURVEY.md §2b.5: SecretKey's constructor re-seeds
// from wall time, so we overwrite the key with setKey() and call srand(seed)
// immediately before each randomized operation.
//
// This file is part of the NEW framework's test tooling; it contains no code
// copied from the reference — it only calls its public API.

#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "certFHE.h"

using namespace certFHE;

static void dump_words(FILE* f, const Ciphertext& c) {
  fprintf(f, "[");
  uint64_t* v = c.getValues();
  for (uint64_t i = 0; i < c.getLen(); i++)
    fprintf(f, "%s\"%llu\"", i ? "," : "", (unsigned long long)v[i]);
  fprintf(f, "]");
}

static void dump_u64_array(FILE* f, const uint64_t* a, uint64_t len) {
  fprintf(f, "[");
  for (uint64_t i = 0; i < len; i++)
    fprintf(f, "%s%llu", i ? "," : "", (unsigned long long)a[i]);
  fprintf(f, "]");
}

struct Scenario {
  uint64_t n, d;
  std::vector<uint64_t> key;
  unsigned seed1, seed0, perm_seed;
};

int main() {
  Library::initializeLibrary();

  std::vector<Scenario> scenarios = {
      {1247, 16,
       {3, 17, 42, 99, 123, 256, 300, 411, 512, 600, 777, 888, 901, 1000, 1100, 1200},
       424242u, 7u, 31337u},
      {95, 4, {5, 20, 33, 80}, 1001u, 2002u, 3003u},
      {4095, 32,
       {1, 64, 65, 127, 128, 200, 300, 400, 500, 600, 700, 800, 900, 1000, 1100,
        1200, 1300, 1400, 1500, 1600, 1700, 1800, 1900, 2000, 2100, 2200, 2300,
        2400, 2500, 3000, 3500, 4094},
       55555u, 66666u, 77777u},
  };

  FILE* f = fopen("tests/golden/golden_vectors.json", "w");
  if (!f) { perror("open"); return 1; }
  fprintf(f, "{\"scenarios\":[\n");

  for (size_t si = 0; si < scenarios.size(); si++) {
    Scenario& sc = scenarios[si];
    Context ctx(sc.n, sc.d);
    SecretKey sk(ctx);
    sk.setKey(sc.key.data(), sc.key.size());

    Plaintext p1(1), p0(0);

    srand(sc.seed1);
    Ciphertext c1 = sk.encrypt(p1);
    srand(sc.seed0);
    Ciphertext c0 = sk.encrypt(p0);

    Ciphertext added = c1 + c0;
    Ciphertext multiplied = c1 * c0;
    Ciphertext big = added * added;          // 2x2 = 4 chunks, i-major order
    Ciphertext bigger = big * added;         // 4x2 = 8 chunks
    Ciphertext biggest = bigger * added;     // 8x2 = 16 chunks (3 multiplies deep)

    Plaintext dec_c1 = sk.decrypt(c1);
    Plaintext dec_c0 = sk.decrypt(c0);
    Plaintext dec_add = sk.decrypt(added);
    Plaintext dec_mul = sk.decrypt(multiplied);
    Plaintext dec_big = sk.decrypt(big);
    Plaintext dec_bigger = sk.decrypt(bigger);
    Plaintext dec_biggest = sk.decrypt(biggest);

    srand(sc.perm_seed);
    Permutation perm(ctx);
    SecretKey psk = sk.applyPermutation(perm);
    Ciphertext pc1 = c1.applyPermutation(perm);
    Plaintext dec_perm = psk.decrypt(pc1);

    Permutation inv = perm.getInverse();
    Permutation ident = perm + inv;

    // Composed permutation (reference operator+ composes routings): a second
    // srand stream, composed = perm then perm2, applied to key and ciphertext.
    srand(sc.perm_seed + 17u);
    Permutation perm2(ctx);
    Permutation composed = perm + perm2;
    SecretKey csk = sk.applyPermutation(composed);
    Ciphertext cc1 = c1.applyPermutation(composed);
    Plaintext dec_comp = csk.decrypt(cc1);

    fprintf(f, "%s{\"n\":%llu,\"d\":%llu,\"key\":", si ? ",\n" : "",
            (unsigned long long)sc.n, (unsigned long long)sc.d);
    dump_u64_array(f, sc.key.data(), sc.key.size());
    fprintf(f, ",\"seed1\":%u,\"seed0\":%u,\"perm_seed\":%u", sc.seed1, sc.seed0,
            sc.perm_seed);
    fprintf(f, ",\"c1\":"); dump_words(f, c1);
    fprintf(f, ",\"c0\":"); dump_words(f, c0);
    fprintf(f, ",\"added\":"); dump_words(f, added);
    fprintf(f, ",\"multiplied\":"); dump_words(f, multiplied);
    fprintf(f, ",\"big\":"); dump_words(f, big);
    fprintf(f, ",\"bigger\":"); dump_words(f, bigger);
    fprintf(f, ",\"biggest\":"); dump_words(f, biggest);
    fprintf(f, ",\"dec\":{\"c1\":%d,\"c0\":%d,\"added\":%d,\"multiplied\":%d,"
            "\"big\":%d,\"bigger\":%d,\"biggest\":%d,\"permuted_c1\":%d,"
            "\"composed_c1\":%d}",
            (int)dec_c1.getValue(), (int)dec_c0.getValue(),
            (int)dec_add.getValue(), (int)dec_mul.getValue(),
            (int)dec_big.getValue(), (int)dec_bigger.getValue(),
            (int)dec_biggest.getValue(), (int)dec_perm.getValue(),
            (int)dec_comp.getValue());
    fprintf(f, ",\"perm\":"); dump_u64_array(f, perm.getPermutation(), perm.getLength());
    fprintf(f, ",\"inv_perm\":"); dump_u64_array(f, inv.getPermutation(), inv.getLength());
    fprintf(f, ",\"identity_check\":"); dump_u64_array(f, ident.getPermutation(), ident.getLength());
    fprintf(f, ",\"permuted_key\":"); dump_u64_array(f, psk.getKey(), psk.getLength());
    fprintf(f, ",\"permuted_c1\":"); dump_words(f, pc1);
    fprintf(f, ",\"perm2\":"); dump_u64_array(f, perm2.getPermutation(), perm2.getLength());
    fprintf(f, ",\"composed_perm\":"); dump_u64_array(f, composed.getPermutation(), composed.getLength());
    fprintf(f, ",\"composed_key\":"); dump_u64_array(f, csk.getKey(), csk.getLength());
    fprintf(f, ",\"composed_c1\":"); dump_words(f, cc1);
    fprintf(f, "}");
  }
  fprintf(f, "\n]}\n");
  fclose(f);
  printf("wrote tests/golden/golden_vectors.json\n");
  return 0;
}
