// Fast ASCII numeric table parser for freeze-out surface files.
//
// Native-runtime counterpart of the reference's C++ readers
// (src/cpp/readindata.cpp, src/cpp/Table.cpp): the reference streams
// whitespace-separated doubles through ifstream>>; this parser tokenizes a
// whole memory buffer with strtod, which is ~an order of magnitude faster
// for the multi-GB surfaces of production (3+1)D hydro runs.
//
// Contract: buf must be NUL-terminated at buf[len] (CPython bytes always
// are) -- strtod may read past `len` otherwise.  Every numeric token must
// end at whitespace, '#', or the buffer end; parse_doubles enforces this
// so a token like "2abc" is rejected (-1) instead of silently splitting.
//
// Exposed via ctypes (no pybind11 in this environment); see build.py.

#include <cstdlib>
#include <cstring>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <locale.h>

// strtod and snprintf %e are LC_NUMERIC-sensitive: an embedding process
// with e.g. a de_DE numeric locale would stop parsing at '.' (silently
// disabling the fast path) or emit comma decimal separators in the writer.
// Both halves run under a forced per-thread C locale (uselocale is
// thread-local).
static locale_t c_numeric_locale()
{
    static locale_t loc = newlocale(LC_ALL_MASK, "C", (locale_t)0);
    return loc;
}

// Skip whitespace and '#'-to-end-of-line comments (matches the tolerant
// Python loader).
static inline const char* skip_sep(const char* p, const char* end)
{
    while (p < end) {
        if (*p == '#') {
            while (p < end && *p != '\n') ++p;
        } else if (isspace((unsigned char)*p)) {
            ++p;
        } else {
            break;
        }
    }
    return p;
}

extern "C" {

// Parse up to max_out doubles from buf[0..len); returns the number parsed,
// or -1 if a token failed to parse or tokens remain beyond max_out.
long long parse_doubles(const char* buf, long long len, double* out,
                        long long max_out)
{
    const char* p = buf;
    const char* end = buf + len;
    long long n = 0;
    locale_t prev = uselocale(c_numeric_locale());
    while ((p = skip_sep(p, end)) < end) {
        if (n >= max_out) { n = -1; break; }  // more tokens than promised
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p ||                      // not a number
            (next < end && !isspace((unsigned char)*next) &&
             *next != '#')) {                 // token has trailing garbage
            n = -1;
            break;
        }
        out[n++] = v;
        p = next;
    }
    uselocale(prev);
    return n;
}

// Count whitespace/comment-separated tokens WITHOUT parsing them (a pure
// scan, ~2x cheaper than a strtod pass over multi-GB buffers); numeric
// validation is parse_doubles' job -- on any non-numeric token the counts
// disagree or parse returns -1, and the caller falls back.
long long count_doubles(const char* buf, long long len)
{
    const char* p = buf;
    const char* end = buf + len;
    long long n = 0;
    while ((p = skip_sep(p, end)) < end) {
        ++n;
        while (p < end && !isspace((unsigned char)*p) && *p != '#') ++p;
    }
    return n;
}

}  // extern "C"

// Append one event to an OSCAR particle-list file: "# n" header then rows
// "mcid t x y z E px py pz" at 16-digit scientific precision (matches the
// reference's write_particle_list_OSC, emissionfunction.cpp:863-901, and
// the Python fallback writer byte for byte).  Returns n, or -1 on I/O
// error.  Native-runtime counterpart of the reference's C++ writer: the
// per-hadron Python formatting loop measured 78 k hadrons/s, an order of
// magnitude slower than the sampler it drains.
extern "C"
long long write_oscar_event(const char* path, int append, long long n,
                            const long long* mcid, const double* t,
                            const double* x, const double* y,
                            const double* z, const double* E,
                            const double* px, const double* py,
                            const double* pz)
{
    FILE* f = fopen(path, append ? "ab" : "wb");
    if (!f) return -1;
    setvbuf(f, nullptr, _IOFBF, 1 << 20);
    if (fprintf(f, "# %lld\n", n) < 0) { fclose(f); return -1; }

    // the cost is the double formatting, not the I/O: format rows in
    // parallel (OpenMP; the pragma is a no-op without -fopenmp) into a
    // fixed-stride chunk buffer, then stream the rows out sequentially
    const long long CH = 1 << 16;
    const int W = 240;            // max row width incl. NUL (9 fields)
    char* buf = (char*)malloc((size_t)CH * W);
    int* lens = (int*)malloc(CH * sizeof(int));
    if (!buf || !lens) { free(buf); free(lens); fclose(f); return -1; }
    long long written = 0;
    for (long long s0 = 0; s0 < n; s0 += CH) {
        long long m = n - s0 < CH ? n - s0 : CH;
        #pragma omp parallel
        {
            locale_t prev = uselocale(c_numeric_locale());
            #pragma omp for schedule(static)
            for (long long i = 0; i < m; ++i) {
                long long j = s0 + i;
                lens[i] = snprintf(buf + (size_t)i * W, W,
                    "%lld %.16e %.16e %.16e %.16e %.16e %.16e %.16e %.16e\n",
                    mcid[j], t[j], x[j], y[j], z[j], E[j], px[j], py[j], pz[j]);
            }
            uselocale(prev);
        }
        for (long long i = 0; i < m; ++i) {
            if (lens[i] <= 0 || lens[i] >= W ||
                fwrite(buf + (size_t)i * W, 1, lens[i], f) != (size_t)lens[i]) {
                free(buf); free(lens); fclose(f); return -1;
            }
        }
        written += m;
    }
    free(buf); free(lens);
    if (fclose(f) != 0) return -1;
    return written;
}
