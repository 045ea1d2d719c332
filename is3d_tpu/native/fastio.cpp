// Fast ASCII numeric table parser for freeze-out surface files.
//
// Native-runtime counterpart of the reference's C++ readers
// (src/cpp/readindata.cpp, src/cpp/Table.cpp): the reference streams
// whitespace-separated doubles through ifstream>>; this parser tokenizes a
// whole memory buffer with strtod, which is ~an order of magnitude faster
// for the multi-GB surfaces of production (3+1)D hydro runs.
//
// Exposed via ctypes (no pybind11 in this environment); see build.py.

#include <cstdlib>
#include <cstring>
#include <cctype>
#include <cstdint>

extern "C" {

// Parse up to max_out doubles from buf[0..len); returns the number parsed,
// or -1 if a token failed to parse.  '#' starts a comment that runs to the
// end of the line (matches the tolerant Python loader).
long long parse_doubles(const char* buf, long long len, double* out,
                        long long max_out)
{
    const char* p = buf;
    const char* end = buf + len;
    long long n = 0;
    while (p < end) {
        // skip whitespace and comments
        while (p < end) {
            if (*p == '#') {
                while (p < end && *p != '\n') ++p;
            } else if (isspace((unsigned char)*p)) {
                ++p;
            } else {
                break;
            }
        }
        if (p >= end) break;
        if (n >= max_out) return n;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) return -1;   // not a number
        out[n++] = v;
        p = next;
    }
    return n;
}

// Count numeric tokens (same comment/whitespace rules) without storing.
long long count_doubles(const char* buf, long long len)
{
    const char* p = buf;
    const char* end = buf + len;
    long long n = 0;
    while (p < end) {
        while (p < end) {
            if (*p == '#') {
                while (p < end && *p != '\n') ++p;
            } else if (isspace((unsigned char)*p)) {
                ++p;
            } else {
                break;
            }
        }
        if (p >= end) break;
        char* next = nullptr;
        strtod(p, &next);
        if (next == p) return -1;
        ++n;
        p = next;
    }
    return n;
}

// Count non-empty, non-comment lines (surface cell counting,
// reference FO_data_reader::get_number_cells, readindata.cpp:122-131).
long long count_rows(const char* buf, long long len)
{
    const char* p = buf;
    const char* end = buf + len;
    long long rows = 0;
    while (p < end) {
        // find content on this line
        bool content = false;
        while (p < end && *p != '\n') {
            if (*p == '#') {            // rest of line is comment
                while (p < end && *p != '\n') ++p;
                break;
            }
            if (!isspace((unsigned char)*p)) content = true;
            ++p;
        }
        if (content) ++rows;
        if (p < end) ++p;               // skip the newline
    }
    return rows;
}

}  // extern "C"
