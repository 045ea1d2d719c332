/* Implementation of the minimal GSL shim (see gsl/gsl_errno.h header note).
   Natural cubic spline (the cspline type) via a Thomas tridiagonal solve;
   LU decomposition with partial pivoting + inversion.  Written from the
   documented GSL semantics so the reference binary can be built as a test
   oracle in an environment without GSL. */

#include <cstdlib>
#include <cmath>
#include <cstring>
#include "gsl/gsl_interp.h"
#include "gsl/gsl_spline.h"
#include "gsl/gsl_matrix.h"
#include "gsl/gsl_permutation.h"
#include "gsl/gsl_linalg.h"
#include "gsl/gsl_sf_bessel.h"

static const gsl_interp_type cspline_type = {0};
const gsl_interp_type *gsl_interp_cspline = &cspline_type;

gsl_interp_accel *gsl_interp_accel_alloc(void)
{
    gsl_interp_accel *a = (gsl_interp_accel *)calloc(1, sizeof(*a));
    return a;
}

void gsl_interp_accel_free(gsl_interp_accel *a) { free(a); }

gsl_spline *gsl_spline_alloc(const gsl_interp_type *, size_t n)
{
    gsl_spline *s = (gsl_spline *)calloc(1, sizeof(*s));
    s->n = n;
    s->x = (double *)calloc(n, sizeof(double));
    s->y = (double *)calloc(n, sizeof(double));
    s->b = (double *)calloc(n, sizeof(double));
    s->c = (double *)calloc(n, sizeof(double));
    s->d = (double *)calloc(n, sizeof(double));
    return s;
}

int gsl_spline_init(gsl_spline *s, const double *x, const double *y, size_t n)
{
    memcpy(s->x, x, n * sizeof(double));
    memcpy(s->y, y, n * sizeof(double));
    if (n < 3) {               /* linear fallback */
        for (size_t i = 0; i + 1 < n; i++) {
            s->b[i] = (y[i + 1] - y[i]) / (x[i + 1] - x[i]);
            s->c[i] = s->d[i] = 0.0;
        }
        return 0;
    }
    size_t m = n - 2;          /* interior second-derivative unknowns */
    double *h = (double *)malloc((n - 1) * sizeof(double));
    double *diag = (double *)malloc(m * sizeof(double));
    double *rhs = (double *)malloc(m * sizeof(double));
    double *cc = (double *)calloc(n, sizeof(double));   /* c_0 = c_{n-1} = 0 */
    for (size_t i = 0; i + 1 < n; i++) h[i] = x[i + 1] - x[i];
    for (size_t i = 0; i < m; i++) {
        diag[i] = 2.0 * (h[i] + h[i + 1]);
        rhs[i] = 3.0 * ((y[i + 2] - y[i + 1]) / h[i + 1]
                        - (y[i + 1] - y[i]) / h[i]);
    }
    /* Thomas solve with sub/super diagonals h[1..m-1] */
    for (size_t i = 1; i < m; i++) {
        double w = h[i] / diag[i - 1];
        diag[i] -= w * h[i];
        rhs[i] -= w * rhs[i - 1];
    }
    cc[m] = rhs[m - 1] / diag[m - 1];
    for (size_t i = m - 1; i >= 1; i--) {
        cc[i] = (rhs[i - 1] - h[i] * cc[i + 1]) / diag[i - 1];
    }
    for (size_t i = 0; i + 1 < n; i++) {
        s->c[i] = cc[i];
        s->b[i] = (y[i + 1] - y[i]) / h[i]
                  - h[i] * (cc[i + 1] + 2.0 * cc[i]) / 3.0;
        s->d[i] = (cc[i + 1] - cc[i]) / (3.0 * h[i]);
    }
    free(h); free(diag); free(rhs); free(cc);
    return 0;
}

double gsl_spline_eval(const gsl_spline *s, double xq, gsl_interp_accel *)
{
    size_t n = s->n;
    size_t lo = 0, hi = n - 1;
    if (xq <= s->x[0]) lo = 0;
    else if (xq >= s->x[n - 1]) lo = n - 2;
    else {
        while (hi - lo > 1) {
            size_t mid = (lo + hi) / 2;
            if (s->x[mid] <= xq) lo = mid; else hi = mid;
        }
    }
    double t = xq - s->x[lo];
    return s->y[lo] + t * (s->b[lo] + t * (s->c[lo] + t * s->d[lo]));
}

void gsl_spline_free(gsl_spline *s)
{
    if (!s) return;
    free(s->x); free(s->y); free(s->b); free(s->c); free(s->d); free(s);
}

/* ----------------------------------------------------------- matrices/LU */

gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2)
{
    gsl_matrix *mm = (gsl_matrix *)calloc(1, sizeof(*mm));
    mm->size1 = n1; mm->size2 = n2;
    mm->data = (double *)calloc(n1 * n2, sizeof(double));
    mm->owner = 1;
    return mm;
}

void gsl_matrix_free(gsl_matrix *m)
{
    if (!m) return;
    if (m->owner) free(m->data);
    free(m);
}

double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j)
{
    return m->data[i * m->size2 + j];
}

gsl_matrix_view gsl_matrix_view_array(double *base, size_t n1, size_t n2)
{
    gsl_matrix_view v;
    v.matrix.size1 = n1; v.matrix.size2 = n2;
    v.matrix.data = base; v.matrix.owner = 0;
    return v;
}

gsl_permutation *gsl_permutation_calloc(size_t n)
{
    gsl_permutation *p = (gsl_permutation *)calloc(1, sizeof(*p));
    p->size = n;
    p->data = (size_t *)calloc(n, sizeof(size_t));
    for (size_t i = 0; i < n; i++) p->data[i] = i;
    return p;
}

void gsl_permutation_free(gsl_permutation *p)
{
    if (!p) return;
    free(p->data); free(p);
}

int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p, int *signum)
{
    size_t n = A->size1;
    *signum = 1;
    for (size_t i = 0; i < n; i++) p->data[i] = i;
    for (size_t k = 0; k < n; k++) {
        /* partial pivot */
        size_t piv = k;
        double amax = fabs(A->data[k * n + k]);
        for (size_t i = k + 1; i < n; i++) {
            double v = fabs(A->data[i * n + k]);
            if (v > amax) { amax = v; piv = i; }
        }
        if (piv != k) {
            for (size_t j = 0; j < n; j++) {
                double tmp = A->data[k * n + j];
                A->data[k * n + j] = A->data[piv * n + j];
                A->data[piv * n + j] = tmp;
            }
            size_t tp = p->data[k]; p->data[k] = p->data[piv]; p->data[piv] = tp;
            *signum = -*signum;
        }
        double akk = A->data[k * n + k];
        if (akk != 0.0) {
            for (size_t i = k + 1; i < n; i++) {
                double f = A->data[i * n + k] / akk;
                A->data[i * n + k] = f;
                for (size_t j = k + 1; j < n; j++)
                    A->data[i * n + j] -= f * A->data[k * n + j];
            }
        }
    }
    return 0;
}

int gsl_linalg_LU_invert(const gsl_matrix *LU, const gsl_permutation *p,
                         gsl_matrix *inverse)
{
    size_t n = LU->size1;
    double *col = (double *)malloc(n * sizeof(double));
    double *y = (double *)malloc(n * sizeof(double));
    for (size_t c = 0; c < n; c++) {
        for (size_t i = 0; i < n; i++) col[i] = (p->data[i] == c) ? 1.0 : 0.0;
        /* forward substitution (unit lower) */
        for (size_t i = 0; i < n; i++) {
            y[i] = col[i];
            for (size_t j = 0; j < i; j++) y[i] -= LU->data[i * n + j] * y[j];
        }
        /* back substitution */
        for (size_t ii = n; ii-- > 0;) {
            double v = y[ii];
            for (size_t j = ii + 1; j < n; j++)
                v -= LU->data[ii * n + j] * inverse->data[j * n + c];
            inverse->data[ii * n + c] = v / LU->data[ii * n + ii];
        }
    }
    free(col); free(y);
    return 0;
}

/* stubbed: only referenced from commented-out reference code */
double gsl_sf_bessel_Kn(int, double) { return 0.0; }
