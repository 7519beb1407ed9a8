/* spec_decoder.c — an INDEPENDENT Snappy decoder written from the public
 * format description only (Google's snappy format_description.txt rev 2011:
 * varint32 preamble; element tags LITERAL=%00, COPY1=%01, COPY2=%10,
 * COPY4=%11; literal lengths 1..60 inline else 1-4 little-endian trailer
 * bytes; copy-1 = 3 offset high bits + 4..11 length; copy-2/4 = 16/32-bit
 * little-endian offsets, length 1..64).
 *
 * Purpose (conformance, SURVEY.md C14): the reference proved its encoder
 * against Google's upstream decoder (snappy_tester.patch:44-117).  No
 * third-party snappy implementation exists on this image, so this file
 * plays that role: it is deliberately written in a different style from
 * everything else in this repo — byte-at-a-time, no tables, no shared
 * helpers, no performance tricks — and from the format documentation
 * alone, so that a bug shared with the main decoders' design cannot hide
 * here.  It links into its own shared object (libspec_decoder.so) and is
 * only used by tests/test_conformance_spec.py to cross-check streams
 * produced by every encoder backend.
 *
 * Return codes: number of output bytes on success, or
 *   -1 bad preamble  -2 truncated/garbage input  -3 bad copy offset
 *   -4 output buffer too small
 */
#include <stddef.h>
#include <stdint.h>

long spec_snappy_uncompressed_length(const uint8_t *in, size_t in_len)
{
    uint32_t value = 0;
    unsigned shift = 0;
    size_t i = 0;
    for (;;) {
        if (i >= in_len || i >= 5)
            return -1;
        uint8_t b = in[i++];
        if (shift == 28 && (b & 0x7f) > 0x0f)
            return -1; /* would overflow 32 bits */
        value |= (uint32_t)(b & 0x7f) << shift;
        if (!(b & 0x80))
            break;
        shift += 7;
    }
    return (long)value; /* caller learns header size via spec_snappy_preamble_size */
}

long spec_snappy_preamble_size(const uint8_t *in, size_t in_len)
{
    size_t i;
    for (i = 0; i < in_len && i < 5; i++)
        if (!(in[i] & 0x80))
            return (long)(i + 1);
    return -1;
}

/* Decode the element stream (no preamble) into out[0..out_cap).  */
long spec_snappy_decode_elements(const uint8_t *in, size_t in_len,
                                 uint8_t *out, size_t out_cap)
{
    size_t ip = 0, op = 0;
    while (ip < in_len) {
        uint8_t tag = in[ip++];
        unsigned kind = tag & 3u;
        if (kind == 0) {
            /* literal: length-1 is in the upper six bits when < 60,
             * otherwise those bits say 60..63 = 1..4 trailer bytes */
            size_t len;
            unsigned six = tag >> 2;
            if (six < 60) {
                len = six + 1;
            } else {
                unsigned nb = six - 59, k;
                uint32_t v = 0;
                if (ip + nb > in_len)
                    return -2;
                for (k = 0; k < nb; k++)
                    v |= (uint32_t)in[ip + k] << (8 * k);
                ip += nb;
                len = (size_t)v + 1;
            }
            if (ip + len > in_len)
                return -2;
            if (op + len > out_cap)
                return -4;
            for (size_t k = 0; k < len; k++)
                out[op + k] = in[ip + k];
            ip += len;
            op += len;
        } else {
            size_t len;
            uint64_t off;
            if (kind == 1) {
                if (ip + 1 > in_len)
                    return -2;
                len = ((tag >> 2) & 7u) + 4;
                off = ((uint64_t)(tag >> 5) << 8) | in[ip];
                ip += 1;
            } else if (kind == 2) {
                if (ip + 2 > in_len)
                    return -2;
                len = (tag >> 2) + 1;
                off = (uint64_t)in[ip] | ((uint64_t)in[ip + 1] << 8);
                ip += 2;
            } else {
                if (ip + 4 > in_len)
                    return -2;
                len = (tag >> 2) + 1;
                off = (uint64_t)in[ip] | ((uint64_t)in[ip + 1] << 8)
                    | ((uint64_t)in[ip + 2] << 16) | ((uint64_t)in[ip + 3] << 24);
                ip += 4;
            }
            if (off == 0 || off > op)
                return -3;
            if (op + len > out_cap)
                return -4;
            for (size_t k = 0; k < len; k++) /* byte order handles overlap */
                out[op + k] = out[op - (size_t)off + k];
            op += len;
        }
    }
    return (long)op;
}

/* Whole stream: preamble + elements; output length must equal the
 * preamble's claim. */
long spec_snappy_decode(const uint8_t *in, size_t in_len,
                        uint8_t *out, size_t out_cap)
{
    long ulen = spec_snappy_uncompressed_length(in, in_len);
    long pre = spec_snappy_preamble_size(in, in_len);
    long got;
    if (ulen < 0 || pre < 0)
        return -1;
    if ((size_t)ulen > out_cap)
        return -4;
    got = spec_snappy_decode_elements(in + pre, in_len - (size_t)pre, out, (size_t)ulen);
    if (got < 0)
        return got;
    if (got != ulen)
        return -2;
    return got;
}
