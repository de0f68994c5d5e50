#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>
extern "C" {
long long wfa_csv_shape(const char*, long long, int, char, long long*);
long long wfa_csv_decode(const char*, long long, int, char, long long, long long, double*);
long long wfa_csv_decode_typed(const char*, long long, int, char,
                               long long, long long, int, int, int,
                               short*, short*, long long*, double*,
                               unsigned short*);
long long wfa_v1725_scan(const char*, long long, long long*);
long long wfa_v1725_decode(const char*, long long, short*, long long*, double*,
                           unsigned char*, long long*, int*, unsigned short*);
long long wfa_v1725_headers(const char*, long long, short*, long long*, double*,
                            unsigned char*, long long*, int*);
}
int main() {
    std::mt19937 rng(42);
    const char alpha[] = "0123456789;.-+e\n\r ";
    for (int iter = 0; iter < 4000; ++iter) {
        int n = rng() % 4096;
        std::vector<char> buf(n + 1);
        bool structured = iter % 2;
        for (int i = 0; i < n; ++i)
            buf[i] = structured ? alpha[rng() % (sizeof(alpha) - 1)]
                                : (char)(rng() % 256);
        long long ncols = 0;
        long long rows = wfa_csv_shape(buf.data(), n, rng() % 3, ';', &ncols);
        if (rows > 0 && ncols > 0) {
            std::vector<double> out((size_t)rows * ncols);
            long long got = wfa_csv_decode(buf.data(), n, rng() % 3, ';',
                                           ncols, rows, out.data());
            if (got > rows) { printf("OVERFLOW csv %lld > %lld\n", got, rows); return 1; }
            // typed fast path (incl. the AVX-512 mask walk): must stay in
            // bounds and within the row budget on ANY input
            if (ncols > 7) {
                std::vector<short> bd(rows), ch2(rows);
                std::vector<long long> ts2(rows);
                std::vector<double> bl2(rows);
                std::vector<unsigned short> sm((size_t)rows * (ncols - 7));
                long long tg = wfa_csv_decode_typed(
                    buf.data(), n, rng() % 3, ';', ncols, rows, 7, 7, 47,
                    bd.data(), ch2.data(), ts2.data(), bl2.data(), sm.data());
                if (tg > rows) { printf("OVERFLOW typed\n"); return 1; }
            }
        }
        long long samp = 0;
        long long rec = wfa_v1725_scan(buf.data(), n, &samp);
        if (rec > 0) {
            std::vector<short> ch(rec); std::vector<long long> ts(rec), off(rec);
            std::vector<double> bl(rec); std::vector<unsigned char> tr(rec);
            std::vector<int> len(rec);
            std::vector<unsigned short> pool(samp ? samp : 1);
            long long got = wfa_v1725_decode(buf.data(), n, ch.data(), ts.data(),
                bl.data(), tr.data(), off.data(), len.data(), pool.data());
            if (got > rec) { printf("OVERFLOW v1725\n"); return 1; }
            // header-only walk must agree with the full decode on counts,
            // lengths, and metadata — and its byte offsets must stay inside
            // the buffer
            std::vector<short> hch(rec); std::vector<long long> hts(rec), hoff(rec);
            std::vector<double> hbl(rec); std::vector<unsigned char> htr(rec);
            std::vector<int> hlen(rec);
            long long hgot = wfa_v1725_headers(buf.data(), n, hch.data(),
                hts.data(), hbl.data(), htr.data(), hoff.data(), hlen.data());
            if (hgot != got) { printf("MISMATCH v1725 headers count\n"); return 1; }
            for (long long r = 0; r < hgot; ++r) {
                if (hch[r] != ch[r] || hts[r] != ts[r] || hbl[r] != bl[r] ||
                    htr[r] != tr[r] || hlen[r] != len[r]) {
                    printf("MISMATCH v1725 headers meta row %lld\n", r); return 1;
                }
                if (hoff[r] < 0 || hoff[r] + 2LL * hlen[r] > n) {
                    printf("OOB v1725 header offset row %lld\n", r); return 1;
                }
            }
        }
    }
    printf("ASAN FUZZ OK\n");
    return 0;
}
// Build & run:
//   g++ -O1 -g -fsanitize=address,undefined \
//       waveformanalysis_tpu/native/csv_decode.cpp scripts/fuzz_native.cpp \
//       -o /tmp/fuzz && /tmp/fuzz
// Sanitizer-backed fuzz of the native decoders (CSV + V1725) over random
// and structured-random buffers; exercised manually / in CI, complements
// tests/test_native.py's in-process fuzz.
