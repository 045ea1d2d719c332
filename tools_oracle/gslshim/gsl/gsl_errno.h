/* Minimal GSL API shim for building the reference binary as a test oracle
   (no GSL in this environment).  Implements only the natural-cubic-spline
   and LU routines the reference calls; written from the public GSL API
   documentation.  NOT a copy of GSL. */
#ifndef GSLSHIM_ERRNO_H
#define GSLSHIM_ERRNO_H
#define GSL_SUCCESS 0
#endif
