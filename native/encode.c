/* Host-side encode hot loops.
 *
 * zt_encode_sequences: the interleaved 3-state FSE sequence bitstream
 * (role of ZSTD_encodeSequences_body,
 * /root/reference/lib/compress/zstd_compress_sequences.c:291 — the exact
 * schedule: init ML,OF,LL states from the last sequence, then per
 * remaining sequence encode OF,ML,LL symbols and add LL,ML,OF extra
 * bits). Table building, normalization and mode selection stay in
 * Python (format/fse.py); this is only the per-sequence bit loop, which
 * dominates host encode time at every level.
 */

#include <stdint.h>
#include <stddef.h>

typedef struct {
    uint64_t acc;
    int nbits;          /* bits resident in acc; kept < 40 */
    uint8_t* p;
    uint8_t* end;
} BW;

static inline void bw_add(BW* b, uint64_t v, int nb) {
    if (b->nbits > 56) return;   /* buffer full (p==end); caller reports -1 */
    b->acc |= (v & (((uint64_t)1 << nb) - 1)) << b->nbits;
    b->nbits += nb;
    while (b->nbits >= 8 && b->p < b->end) {
        *b->p++ = (uint8_t)b->acc;
        b->acc >>= 8;
        b->nbits -= 8;
    }
}

static inline int64_t bw_close(BW* b, const uint8_t* out0) {
    b->acc |= (uint64_t)1 << b->nbits;      /* sentinel bit */
    b->nbits += 1;
    while (b->nbits > 0) {
        if (b->p >= b->end) return -1;
        *b->p++ = (uint8_t)b->acc;
        b->acc >>= 8;
        b->nbits -= 8;
    }
    return (int64_t)(b->p - out0);
}

typedef struct {
    int64_t value;
    int tlog;
    const int32_t* st;
    const int64_t* dnb;
    const int64_t* dfs;
} CSt;

static inline void cs_init(CSt* c, int sym) {
    int64_t d = c->dnb[sym];
    int nb = (int)((d + (1 << 15)) >> 16);
    int64_t v = ((int64_t)nb << 16) - d;
    c->value = c->st[(v >> nb) + c->dfs[sym]];
}

static inline void cs_encode(CSt* c, BW* b, int sym) {
    int nb = (int)((c->value + c->dnb[sym]) >> 16);
    bw_add(b, (uint64_t)c->value, nb);
    c->value = c->st[(c->value >> nb) + c->dfs[sym]];
}

int64_t zt_encode_sequences(
    int64_t n,
    const int32_t* ll, const int32_t* ob, const int32_t* mb,
    const int32_t* llc, const int32_t* ofc, const int32_t* mlc,
    const int32_t* ll_bits, const int32_t* ml_bits,
    int ll_tlog, const int32_t* ll_st, const int64_t* ll_dnb,
    const int64_t* ll_dfs,
    int of_tlog, const int32_t* of_st, const int64_t* of_dnb,
    const int64_t* of_dfs,
    int ml_tlog, const int32_t* ml_st, const int64_t* ml_dnb,
    const int64_t* ml_dfs,
    uint8_t* out, int64_t out_cap)
{
    if (n <= 0) return -1;
    BW b = {0, 0, out, out + out_cap};
    CSt sll = {0, ll_tlog, ll_st, ll_dnb, ll_dfs};
    CSt sof = {0, of_tlog, of_st, of_dnb, of_dfs};
    CSt sml = {0, ml_tlog, ml_st, ml_dnb, ml_dfs};
    int64_t last = n - 1;
    cs_init(&sml, mlc[last]);
    cs_init(&sof, ofc[last]);
    cs_init(&sll, llc[last]);
    bw_add(&b, (uint64_t)(uint32_t)ll[last], ll_bits[llc[last]]);
    bw_add(&b, (uint64_t)(uint32_t)mb[last], ml_bits[mlc[last]]);
    bw_add(&b, (uint64_t)(uint32_t)ob[last], ofc[last]);
    for (int64_t i = n - 2; i >= 0; i--) {
        cs_encode(&sof, &b, ofc[i]);
        cs_encode(&sml, &b, mlc[i]);
        cs_encode(&sll, &b, llc[i]);
        bw_add(&b, (uint64_t)(uint32_t)ll[i], ll_bits[llc[i]]);
        bw_add(&b, (uint64_t)(uint32_t)mb[i], ml_bits[mlc[i]]);
        bw_add(&b, (uint64_t)(uint32_t)ob[i], ofc[i]);
        if (b.p >= b.end) return -1;
    }
    bw_add(&b, (uint64_t)sml.value, sml.tlog);
    bw_add(&b, (uint64_t)sof.value, sof.tlog);
    bw_add(&b, (uint64_t)sll.value, sll.tlog);
    return bw_close(&b, out);
}

/* Huffman literal bitstream (HUF_compress1X_usingCTable role): symbols
 * encoded last-to-first through the same backward bit writer. nb/val are
 * the canonical code table (nbBits, value) per symbol. */
int64_t zt_huf_encode(const uint8_t* data, int64_t n,
                      const int32_t* nb, const int32_t* val,
                      uint8_t* out, int64_t out_cap)
{
    BW b = {0, 0, out, out + out_cap};
    for (int64_t i = n - 1; i >= 0; i--) {
        int s = data[i];
        bw_add(&b, (uint64_t)(uint32_t)val[s], nb[s]);
        if (b.p >= b.end) return -1;
    }
    return bw_close(&b, out);
}
