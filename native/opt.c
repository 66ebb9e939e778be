/* Optimal-parse sequence extraction (btopt/btultra class, levels 13-22).
 *
 * Same *role* as the reference's zstd_opt.c (price-model DP over block
 * positions; /root/reference/lib/compress/zstd_opt.c
 * ZSTD_compressBlock_opt_generic, ZSTD_getMatchPrice:324) but an original
 * design: hash-chain candidate enumeration (deep walk, increasing-length
 * match set) + full-block forward DP with per-cell repcode state, seeded by
 * an internal greedy statistics pass (the btultra2 two-pass idea).
 *
 * Price accounting: cell price accumulates literal prices plus incremental
 * literal-length-code deltas (llp(run+1)-llp(run)); a match step adds
 * llp(0) (the code-base term the deltas telescope from) + offset-code +
 * match-length-code prices. Trailing literals after the last sequence
 * carry no LL cost, matching the format.
 *
 * This is host-native on purpose: the DP is byte-serial and branchy — the
 * one part of the encoder that does not map to the TPU vector units — while
 * the level 1-12 paths run as batched device kernels.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#define MINMATCH 3
#define PINF ((int64_t)1 << 60)
#define SCALE 256            /* price unit: 1/256 bit */
#define MAX_CAND 64          /* max distinct-length candidates per position */
#define RELAX_CAP 128         /* relax all lengths up to this; plus the max */
#define SEQ_BIAS 16          /* tiny per-sequence bias (1/16 bit) */

/* ---- format code tables (RFC 8878 sequence codes) ---- */

static const uint32_t LL_BASE[36] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536};
static const uint8_t LL_BITS[36] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16};
static const uint32_t ML_BASE[53] = {
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37,
    39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539};
static const uint8_t ML_BITS[53] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1,
    1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16};

static inline uint32_t highbit(uint32_t v) { return 31 - __builtin_clz(v); }

static inline uint32_t ml_code_exact(uint32_t mlb) { /* mlb = len - 3 */
    if (mlb <= 31) return mlb;
    uint32_t lo = 32, hi = 52, l = mlb + 3;
    while (lo < hi) {
        uint32_t mid = (lo + hi + 1) >> 1;
        if (ML_BASE[mid] <= l) lo = mid; else hi = mid - 1;
    }
    return lo;
}

static inline uint32_t ll_code_exact(uint32_t ll) {
    if (ll <= 15) return ll;
    uint32_t lo = 16, hi = 35;
    while (lo < hi) {
        uint32_t mid = (lo + hi + 1) >> 1;
        if (LL_BASE[mid] <= ll) lo = mid; else hi = mid - 1;
    }
    return lo;
}

/* ---- price model ---- */

typedef struct {
    uint32_t lit[256], llc[36], mlc[53], ofc[32];
    uint32_t lit_tot, ll_tot, ml_tot, of_tot;
    int64_t lit_price[256], ll_price[36], ml_price[53], of_price[32];
} Prices;

static int64_t log2_frac(uint32_t num, uint32_t den) {
    return (int64_t)(log2((double)num / (double)den) * SCALE + 0.5);
}

static void prices_rebuild_ex(Prices* P, int64_t PRIOR) {
    /* Optimistic floor on sequence-code prices: a code absent from the
     * seeding parse would otherwise cost log2(total/1) ~ 10+ bits, which
     * prices it out of the NEXT parse too — a self-reinforcing equilibrium
     * that permanently rejects e.g. 3-byte rep matches on stride data.
     * The reference dodges this by rescaling counts toward a baseline
     * (ZSTD_rescaleFreqs, /root/reference/lib/compress/zstd_opt.c:141);
     * here: early iterations cap code prices at an optimistic prior so
     * unseen-but-plausible codes stay reachable; the final iteration
     * relaxes the cap so real (learned) frequencies decide. */
    for (int i = 0; i < 256; i++)
        P->lit_price[i] = log2_frac(P->lit_tot + 256, P->lit[i] + 1);
    for (int i = 0; i < 36; i++) {
        int64_t p = log2_frac(P->ll_tot + 36, P->llc[i] + 1);
        if (p > PRIOR) p = PRIOR;
        P->ll_price[i] = p + (int64_t)SCALE * LL_BITS[i];
    }
    for (int i = 0; i < 53; i++) {
        int64_t p = log2_frac(P->ml_tot + 53, P->mlc[i] + 1);
        if (p > PRIOR) p = PRIOR;
        P->ml_price[i] = p + (int64_t)SCALE * ML_BITS[i];
    }
    for (int i = 0; i < 32; i++) {
        int64_t p = log2_frac(P->of_tot + 32, P->ofc[i] + 1);
        if (p > PRIOR) p = PRIOR;
        P->of_price[i] = p + (int64_t)SCALE * i;  /* ofCode == nb extra bits */
    }
}

static void prices_rebuild(Prices* P) {
    prices_rebuild_ex(P, (int64_t)(3.5 * SCALE));
}

static inline int64_t llp(const Prices* P, uint32_t ll) {
    return P->ll_price[ll_code_exact(ll)];
}

/* ---- LCP ---- */

static inline int64_t lcp(const uint8_t* a, const uint8_t* b, int64_t limit) {
    int64_t n = 0;
    while (n + 8 <= limit) {
        uint64_t xa, xb;
        memcpy(&xa, a + n, 8);
        memcpy(&xb, b + n, 8);
        uint64_t x = xa ^ xb;
        if (x) return n + (__builtin_ctzll(x) >> 3);
        n += 8;
    }
    while (n < limit && a[n] == b[n]) n++;
    return n;
}

/* ---- hash chains ---- */

#define HASH3_LOG 16

typedef struct {
    int32_t* head;       /* [1<<hash_log] most recent position or -1 */
    int32_t* chain;      /* [n_total] prev same-bucket position or -1 */
    int32_t* head3;      /* [1<<HASH3_LOG] most recent 3-byte match or -1 */
    int32_t* bt0;        /* [n_total] suffix-smaller child (bt mode) */
    int32_t* bt1;        /* [n_total] suffix-larger child (bt mode) */
    int hash_log;
    int64_t base_pos;    /* chain index = pos - base_pos */
} Chains;

static inline uint32_t hash4(const uint8_t* p, int hash_log) {
    uint32_t v;
    memcpy(&v, p, 4);
    return (uint32_t)((uint64_t)v * 2654435761u >> (32 - hash_log)) &
           ((1u << hash_log) - 1);
}

static inline uint32_t hash3(const uint8_t* p) {
    uint32_t v = p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16);
    return (v * 506832829u) >> (32 - HASH3_LOG);
}

static inline void chains_insert(Chains* C, const uint8_t* base, int64_t pos) {
    uint32_t h = hash4(base + pos, C->hash_log);
    C->chain[pos - C->base_pos] = C->head[h];
    C->head[h] = (int32_t)pos;
    C->head3[hash3(base + pos)] = (int32_t)pos;
}

typedef struct { uint32_t len; uint32_t dist; } Match;

/* matches with strictly increasing length, walking recent -> old, so each
   length is achieved at its smallest available distance */
static int find_matches(const Chains* C, const uint8_t* base, int64_t pos,
                        int64_t window_low, int64_t limit_pos, int attempts,
                        int32_t prev3, Match* out) {
    int n = 0;
    uint32_t best = MINMATCH - 1;
    /* 3-byte probe: closest short match (len >= 3). head3 has no chain, so
     * the caller must capture it BEFORE inserting the current position
     * (otherwise the probe only ever sees itself). */
    {
        int32_t c3 = prev3;
        if (c3 >= 0 && c3 >= window_low && (int64_t)c3 < pos) {
            int64_t l = lcp(base + pos, base + c3, limit_pos - pos);
            if (l >= 3) {
                out[n].len = (uint32_t)l;
                out[n].dist = (uint32_t)(pos - c3);
                n++;
                best = (uint32_t)l;
                if ((uint32_t)l >= (uint32_t)(limit_pos - pos)) return n;
            }
        }
    }
    if (best < MINMATCH) best = MINMATCH;   /* chains provide len >= 4 */
    uint32_t h = hash4(base + pos, C->hash_log);
    int32_t cand = C->head[h];
    int64_t limit = limit_pos - pos;
    while (cand >= 0 && cand >= window_low && attempts-- > 0) {
        if ((int64_t)cand < pos) {
            int64_t l = lcp(base + pos, base + cand, limit);
            if ((uint32_t)l > best) {
                out[n].len = (uint32_t)l;
                out[n].dist = (uint32_t)(pos - cand);
                n++;
                best = (uint32_t)l;
                if (n >= MAX_CAND || l >= limit) break;
            }
        }
        cand = C->chain[cand - C->base_pos];
    }
    return n;
}

/* ---- suffix-ordered binary-tree matchfinder (btultra2 levels) ----
 *
 * Role of the reference's deep search (zstd_opt.c:590
 * ZSTD_insertBtAndGetAllMatches): every window position hangs in a binary
 * tree ordered by suffix, rooted at its hash-4 bucket. One walk both
 * inserts `pos` and visits candidates whose common prefix can only shrink
 * along the path, so distant LONG matches are reached within a bounded
 * node budget — the chain walk above is recency-ordered and exhausts its
 * budget on near, short candidates (the measured +0.6% at 8 MB, level 19).
 * Implementation is the classic suffix-BST formulation, written to this
 * file's conventions. */

#define BT_TMP 96

/* limit_pos caps RECORDED match lengths (block end); data_end bounds the
 * ORDERING comparisons. Ordering must be consistent across every insert
 * that ever touches the tree — truncating comparisons at a per-call block
 * end breaks the common-prefix-skip invariant once the tree persists
 * across blocks (observed as overstated matches -> corrupt output). */
static int bt_search_insert(Chains* C, const uint8_t* base, int64_t pos,
                            int64_t window_low, int64_t limit_pos,
                            int64_t data_end,
                            int nodes, Match* out, int32_t prev3) {
    uint32_t h = hash4(base + pos, C->hash_log);
    int32_t cur = C->head[h];
    C->head[h] = (int32_t)pos;
    int32_t* p_sm = &C->bt0[pos - C->base_pos];
    int32_t* p_lg = &C->bt1[pos - C->base_pos];
    uint32_t len_sm = 0, len_lg = 0;
    int64_t limit = limit_pos - pos;       /* recorded-length cap */
    int64_t cmp_limit = data_end - pos;    /* ordering comparisons */
    Match tmp[BT_TMP];
    int nt = 0;
    uint32_t best = MINMATCH - 1;
    /* closest 3-byte-hash candidate seeds the list (the tree carries only
       hash-4 buckets, so the very nearest short match can be absent) */
    if (out && prev3 >= 0 && prev3 >= window_low && (int64_t)prev3 < pos) {
        int64_t l3 = lcp(base + pos, base + prev3, limit);
        if (l3 >= MINMATCH) {
            tmp[nt].len = (uint32_t)l3;
            tmp[nt].dist = (uint32_t)(pos - prev3);
            nt++;
            best = (uint32_t)l3;
        }
    }
    while (cur >= 0 && cur >= window_low && (int64_t)cur < pos &&
           nodes-- > 0) {
        int64_t ci = cur - C->base_pos;
        uint32_t l0 = len_sm < len_lg ? len_sm : len_lg;
        int64_t l = l0 + lcp(base + pos + l0, base + cur + l0,
                             cmp_limit - l0);
        int64_t lrec = l < limit ? l : limit;
        if (out && lrec >= MINMATCH) {
            if (nt < BT_TMP - 1) {
                tmp[nt].len = (uint32_t)lrec;
                tmp[nt].dist = (uint32_t)(pos - cur);
                nt++;
            } else if ((uint32_t)lrec > best) {
                tmp[nt].len = (uint32_t)lrec;
                tmp[nt].dist = (uint32_t)(pos - cur);
            }
            if ((uint32_t)lrec > best) best = (uint32_t)lrec;
        }
        if (l >= cmp_limit) {
            /* full-suffix match: adopt cur's subtrees and stop */
            *p_sm = C->bt0[ci];
            *p_lg = C->bt1[ci];
            p_sm = p_lg = NULL;
            break;
        }
        if (base[cur + l] < base[pos + l]) {
            int32_t nxt = C->bt1[ci];
            *p_sm = cur;
            p_sm = &C->bt1[ci];
            len_sm = (uint32_t)l;
            cur = nxt;
        } else {
            int32_t nxt = C->bt0[ci];
            *p_lg = cur;
            p_lg = &C->bt0[ci];
            len_lg = (uint32_t)l;
            cur = nxt;
        }
    }
    if (p_sm) *p_sm = -1;
    if (p_lg) *p_lg = -1;
    if (!out || nt == 0) return 0;

    /* candidates arrive in tree order; the DP consumes an ascending
       (length, min-distance-over-longer) staircase */
    for (int a = 1; a < nt; a++) {           /* insertion sort by len */
        Match key = tmp[a];
        int b = a - 1;
        while (b >= 0 && (tmp[b].len > key.len ||
                          (tmp[b].len == key.len &&
                           tmp[b].dist > key.dist))) {
            tmp[b + 1] = tmp[b];
            b--;
        }
        tmp[b + 1] = key;
    }
    uint32_t run_min[BT_TMP];
    uint32_t mind = 0xFFFFFFFFu;
    for (int a = nt - 1; a >= 0; a--) {
        if (tmp[a].dist < mind) mind = tmp[a].dist;
        run_min[a] = mind;
    }
    int n = 0;
    uint32_t last_len = 0;
    for (int a = 0; a < nt && n < MAX_CAND; a++) {
        if (tmp[a].len <= last_len) continue;
        out[n].len = tmp[a].len;
        out[n].dist = run_min[a];
        last_len = tmp[a].len;
        n++;
    }
    return n;
}

/* ---- DP cells ---- */

typedef struct {
    int64_t price;
    uint32_t ml;       /* 0 = literal step arrived here */
    uint32_t ob;       /* offBase of arriving match */
    uint32_t ll;       /* literal run consumed by arriving match */
    uint32_t rep[3];
    uint32_t litrun;   /* pending literal run at this cell */
} Cell;

static inline uint32_t off_base(uint32_t d, uint32_t ll, const uint32_t* rep) {
    if (ll != 0) {
        if (d == rep[0]) return 1;
        if (d == rep[1]) return 2;
        if (d == rep[2]) return 3;
    } else {
        if (d == rep[1]) return 1;
        if (d == rep[2]) return 2;
        if (d == rep[0] - 1 && d > 0) return 3;
    }
    return d + 3;
}

static inline void rep_update(const uint32_t* rep, uint32_t ob, uint32_t ll,
                              uint32_t* out) {
    if (ob > 3) {
        out[0] = ob - 3; out[1] = rep[0]; out[2] = rep[1];
        return;
    }
    uint32_t idx = ob + (ll == 0 ? 1 : 0);
    if (idx == 1) { out[0] = rep[0]; out[1] = rep[1]; out[2] = rep[2]; }
    else if (idx == 2) { out[0] = rep[1]; out[1] = rep[0]; out[2] = rep[2]; }
    else if (idx == 3) { out[0] = rep[2]; out[1] = rep[0]; out[2] = rep[1]; }
    else { out[0] = rep[0] - 1; out[1] = rep[0]; out[2] = rep[1]; }
}

static inline void relax(Cell* cells, int64_t i, uint32_t l, int64_t np,
                         uint32_t ob, uint32_t ll, const uint32_t* rep_src) {
    Cell* t = &cells[i + l];
    if (np < t->price) {
        t->price = np; t->ml = l; t->ob = ob; t->ll = ll; t->litrun = 0;
        rep_update(rep_src, ob, ll, t->rep);
    }
}

/* greedy statistics pass: longest-match commit, collects code histograms */
static void stats_pass(const uint8_t* base, int64_t bs, int64_t be,
                       int64_t window_low, int64_t data_end,
                       const uint32_t* reps0,
                       Chains* C, int attempts, Prices* P, int use_bt) {
    uint32_t rep[3] = {reps0[0], reps0[1], reps0[2]};
    int64_t ip = bs, anchor = bs;
    Match m[MAX_CAND];
    while (ip + 8 < be) {
        int32_t prev3 = C->head3[hash3(base + ip)];
        int nm_bt = 0;
        if (use_bt) {
            C->head3[hash3(base + ip)] = (int32_t)ip;
            nm_bt = bt_search_insert(C, base, ip, window_low, be, data_end,
                                     attempts, m, prev3);
        } else {
            chains_insert(C, base, ip);
        }
        uint32_t bl = 0, bd = 0;
        for (int r = 0; r < 3; r++) {
            uint32_t d = rep[r];
            if (d == 0 || ip - (int64_t)d < window_low) continue;
            if (memcmp(base + ip, base + ip - d, 4) == 0) {
                int64_t l = 4 + lcp(base + ip + 4, base + ip - d + 4,
                                    be - ip - 4);
                if ((uint32_t)l > bl) { bl = (uint32_t)l; bd = d; }
            }
        }
        int nm = use_bt ? nm_bt
                        : find_matches(C, base, ip, window_low, be,
                                       attempts, prev3, m);
        (void)prev3;
        if (nm > 0 && m[nm - 1].len > bl + 1) {
            bl = m[nm - 1].len;
            bd = m[nm - 1].dist;
        }
        if (bl >= 4) {
            uint32_t ll = (uint32_t)(ip - anchor);
            uint32_t ob = off_base(bd, ll, rep);
            for (int64_t q = anchor; q < ip; q++) { P->lit[base[q]]++; }
            P->lit_tot += ll;
            P->llc[ll_code_exact(ll)]++; P->ll_tot++;
            P->mlc[ml_code_exact(bl - MINMATCH)]++; P->ml_tot++;
            P->ofc[highbit(ob)]++; P->of_tot++;
            uint32_t nr[3]; rep_update(rep, ob, ll, nr);
            rep[0] = nr[0]; rep[1] = nr[1]; rep[2] = nr[2];
            int64_t end = ip + bl;
            for (int64_t q = ip + 1; q < end && q + 4 <= be; q += 2) {
                if (use_bt) {
                    C->head3[hash3(base + q)] = (int32_t)q;
                    bt_search_insert(C, base, q, window_low, be, data_end,
                                     48, NULL, -1);
                } else {
                    chains_insert(C, base, q);
                }
            }
            ip = end; anchor = end;
        } else {
            ip++;
        }
    }
    for (int64_t q = anchor; q < be; q++) { P->lit[base[q]]++; P->lit_tot++; }
}

/* ---- persistent match-finder context ----
 * The matcher state (hash heads, chains / suffix-BST) persists across the
 * blocks of one frame (role of the reference's ZSTD_matchState_t living in
 * the CCtx): without it every block call re-inserted the whole window —
 * O(window) per block, quadratic per frame, and ruinous for the BT walk. */
typedef struct {
    Chains C;
    int64_t cap_total;      /* allocated chain/bt length */
    int64_t ins_until;      /* first position not yet inserted */
    int inited;
    int use_bt;
    int hash_log;
    int32_t* head_snap;
    int32_t* head3_snap;
    int32_t* bt0_snap;
    int32_t* bt1_snap;
} OptCtx;

void* zt_opt_ctx_new(void) { return calloc(1, sizeof(OptCtx)); }

static void opt_ctx_release(OptCtx* x) {
    free(x->C.head); free(x->C.chain); free(x->C.head3);
    free(x->C.bt0); free(x->C.bt1);
    free(x->head_snap); free(x->head3_snap);
    free(x->bt0_snap); free(x->bt1_snap);
    memset(x, 0, sizeof(*x));
}

void zt_opt_ctx_free(void* v) {
    if (!v) return;
    opt_ctx_release((OptCtx*)v);
    free(v);
}

/* make the context valid with all positions [window_low, block_start)
 * inserted (tail-gated at p+4 <= block_start); returns 0 ok / -1 oom */
static int opt_ctx_ensure(OptCtx* x, const uint8_t* base, int64_t window_low,
                          int64_t block_start, int64_t block_end,
                          int64_t data_end, int hash_log, int use_bt) {
    size_t head_bytes = sizeof(int32_t) << hash_log;
    size_t head3_bytes = sizeof(int32_t) << HASH3_LOG;
    int fresh = !x->inited || x->use_bt != use_bt ||
                x->hash_log != hash_log || block_start < x->ins_until ||
                window_low < x->C.base_pos;
    /* bound array growth on huge inputs: restart from the live window */
    if (!fresh && block_end - x->C.base_pos > (int64_t)1 << 26 &&
        window_low > x->C.base_pos + ((int64_t)1 << 25))
        fresh = 1;
    if (fresh) {
        opt_ctx_release(x);
        x->hash_log = hash_log;
        x->use_bt = use_bt;
        x->C.hash_log = hash_log;
        x->C.base_pos = window_low;
        x->cap_total = (block_end - window_low) + (block_end - window_low) / 2
                       + 4096;
        x->C.head = malloc(head_bytes);
        x->C.head3 = malloc(head3_bytes);
        x->head_snap = malloc(head_bytes);
        x->head3_snap = malloc(head3_bytes);
        if (use_bt) {
            x->C.bt0 = malloc(sizeof(int32_t) * (size_t)x->cap_total);
            x->C.bt1 = malloc(sizeof(int32_t) * (size_t)x->cap_total);
            x->bt0_snap = malloc(sizeof(int32_t) * (size_t)x->cap_total);
            x->bt1_snap = malloc(sizeof(int32_t) * (size_t)x->cap_total);
            if (!x->C.bt0 || !x->C.bt1 || !x->bt0_snap || !x->bt1_snap)
                return -1;
        } else {
            x->C.chain = malloc(sizeof(int32_t) * (size_t)x->cap_total);
            if (!x->C.chain) return -1;
        }
        if (!x->C.head || !x->C.head3 || !x->head_snap || !x->head3_snap)
            return -1;
        memset(x->C.head, -1, head_bytes);
        memset(x->C.head3, -1, head3_bytes);
        x->ins_until = window_low;
        x->inited = 1;
    } else if (block_end - x->C.base_pos > x->cap_total) {
        int64_t ncap = (block_end - x->C.base_pos)
                       + (block_end - x->C.base_pos) / 2 + 4096;
        if (use_bt) {
            int32_t* a = realloc(x->C.bt0, sizeof(int32_t) * (size_t)ncap);
            int32_t* b = realloc(x->C.bt1, sizeof(int32_t) * (size_t)ncap);
            int32_t* c = realloc(x->bt0_snap, sizeof(int32_t) * (size_t)ncap);
            int32_t* d = realloc(x->bt1_snap, sizeof(int32_t) * (size_t)ncap);
            if (!a || !b || !c || !d) return -1;
            x->C.bt0 = a; x->C.bt1 = b; x->bt0_snap = c; x->bt1_snap = d;
        } else {
            int32_t* a = realloc(x->C.chain, sizeof(int32_t) * (size_t)ncap);
            if (!a) return -1;
            x->C.chain = a;
        }
        x->cap_total = ncap;
    }
    /* catch up: insert everything before the block */
    if (use_bt) {
        for (int64_t p = x->ins_until; p + 4 <= block_start; p++) {
            x->C.head3[hash3(base + p)] = (int32_t)p;
            bt_search_insert(&x->C, base, p, window_low, block_start,
                             data_end, 64, NULL, -1);
        }
    } else {
        for (int64_t p = x->ins_until; p + 4 <= block_start; p++)
            chains_insert(&x->C, base, p);
    }
    if (block_start - 3 > x->ins_until) x->ins_until = block_start - 3;
    return 0;
}

int64_t zt_opt_parse_ctx(void* vctx,
                         const uint8_t* base, int64_t window_low,
                         int64_t block_start, int64_t block_end,
                         int64_t src_end,
                         uint32_t* reps,
                         int32_t* ll_out, int32_t* ob_out, int32_t* mb_out,
                         int64_t seq_cap,
                         int hash_log, int search_log, int min_match,
                         int target_len, int strategy) {
    (void)min_match;
    int64_t n = block_end - block_start;
    if (n < 16) return 0;
    if (hash_log > 24) hash_log = 24;
    if (hash_log < 12) hash_log = 12;
    /* deep chain walk: each attempt is one candidate visit; the dense walk
       substitutes for the reference's binary-tree search quality. btultra2
       rows (targetLength >= 256, levels 19+) walk deepest. */
    int attempts = 1 << (search_log < 4 ? 4 : (search_log > 11 ? 11 : search_log));
    /* depth ladder: the same DP serves levels 3-22; lazy-class levels use a
       shallower walk (speed), btopt/btultra2 the deepest */
    int min_att = (strategy <= 3) ? 48
                : (strategy <= 5) ? 96
                : (target_len >= 256) ? 1024 : 256;
    if (attempts < min_att) attempts = min_att;
    if (strategy <= 5 && attempts > min_att) attempts = min_att;

    /* btultra2 levels route through the suffix-BST matchfinder; the chain
       walk serves everything below */
    int use_bt = (strategy >= 9);

    OptCtx* X = (OptCtx*)vctx;
    if (src_end < block_end) src_end = block_end;
    if (opt_ctx_ensure(X, base, window_low, block_start, block_end,
                       src_end, hash_log, use_bt) < 0) return -1;
    Chains C = X->C;   /* struct copy: pointers shared with the ctx */
    size_t head_bytes = sizeof(int32_t) << hash_log;
    size_t head3_bytes = sizeof(int32_t) << HASH3_LOG;
    int64_t prefix_n = block_start - C.base_pos;
    int32_t* head_copy = X->head_snap;
    int32_t* head3_copy = X->head3_snap;
    int32_t* bt0_copy = X->bt0_snap;
    int32_t* bt1_copy = X->bt1_snap;
    Cell* cells = malloc(sizeof(Cell) * (size_t)(n + 1));
    Match* m = malloc(sizeof(Match) * MAX_CAND);
    int64_t rc = -1;
    if (!cells || !m) goto done;

    /* snapshot the at-block-entry matcher state (iterations re-insert) */
    memcpy(head_copy, C.head, head_bytes);
    memcpy(head3_copy, C.head3, head3_bytes);
    if (use_bt && prefix_n) {
        memcpy(bt0_copy, C.bt0, sizeof(int32_t) * (size_t)prefix_n);
        memcpy(bt1_copy, C.bt1, sizeof(int32_t) * (size_t)prefix_n);
    }

    /* pass 1: statistics */
    Prices P;
    memset(&P, 0, sizeof(P));
    stats_pass(base, block_start, block_end, window_low, src_end, reps, &C,
               attempts > 64 ? 64 : attempts, &P, use_bt);
    prices_rebuild(&P);

    /* pass 2+: iterated DP (second iteration re-prices from the first
       iteration's own parse — the btultra2 self-seeding idea) */
    int n_iters = (n < 4096) ? 1
                : (strategy >= 9) ? 5
                : (strategy >= 8) ? 4
                : (strategy >= 6) ? 3 : 2;
    for (int iter = 0; iter < n_iters; iter++) {
    memcpy(C.head, head_copy, head_bytes);   /* reset to prefix state */
    memcpy(C.head3, head3_copy, head3_bytes);
    if (use_bt && prefix_n) {
        /* prefix nodes may have hooked block positions last iteration */
        memcpy(C.bt0, bt0_copy, sizeof(int32_t) * (size_t)prefix_n);
        memcpy(C.bt1, bt1_copy, sizeof(int32_t) * (size_t)prefix_n);
    }

    for (int64_t i = 0; i <= n; i++) { cells[i].price = PINF; cells[i].litrun = 0; }
    cells[0].price = 0;
    cells[0].ml = 0;
    cells[0].rep[0] = reps[0]; cells[0].rep[1] = reps[1];
    cells[0].rep[2] = reps[2];

    for (int64_t i = 0; i < n; i++) {
        Cell* c = &cells[i];
        int64_t pos = block_start + i;
        int32_t prev3 = -1;
        int nm_bt = 0;
        if (pos + 4 <= block_end) {
            prev3 = C.head3[hash3(base + pos)];
            if (use_bt) {
                C.head3[hash3(base + pos)] = (int32_t)pos;
                nm_bt = bt_search_insert(
                    &C, base, pos, window_low, block_end, src_end, attempts,
                    (c->price < PINF && pos + 8 < block_end) ? m : NULL,
                    prev3);
            } else {
                chains_insert(&C, base, pos);
            }
        }
        if (c->price >= PINF) continue;

        /* literal step: lit price + incremental LL-code delta */
        {
            uint32_t lr = c->litrun;
            int64_t np = c->price + P.lit_price[base[pos]]
                         + (llp(&P, lr + 1) - llp(&P, lr));
            Cell* t = &cells[i + 1];
            if (np < t->price) {
                t->price = np;
                t->ml = 0;
                t->litrun = lr + 1;
                t->rep[0] = c->rep[0]; t->rep[1] = c->rep[1];
                t->rep[2] = c->rep[2];
            }
        }

        if (pos + 8 >= block_end) continue;   /* tail stays literal */
        int64_t limit = block_end - pos;
        uint32_t ll = c->litrun;
        /* match base: cell price already holds llp(ll)-llp(0); add the base */
        int64_t mbase = c->price + P.ll_price[0] + SEQ_BIAS;

        /* rep matches (len >= 3) */
        for (int r = 0; r < 3; r++) {
            uint32_t d;
            if (ll != 0) d = c->rep[r];
            else d = (r == 0) ? c->rep[1] : (r == 1) ? c->rep[2]
                              : (c->rep[0] > 1 ? c->rep[0] - 1 : 0);
            uint32_t ob = r + 1;
            if (d == 0 || pos - (int64_t)d < window_low) continue;
            if (memcmp(base + pos, base + pos - d, 3) != 0) continue;
            int64_t L64 = 3 + lcp(base + pos + 3, base + pos - d + 3,
                                  limit - 3);
            uint32_t L = (uint32_t)L64;
            int64_t ofp = P.of_price[highbit(ob)];
            uint32_t cap = L < RELAX_CAP ? L : RELAX_CAP;
            for (uint32_t l = 3; l <= cap; l++)
                relax(cells, i, l,
                      mbase + ofp + P.ml_price[ml_code_exact(l - MINMATCH)],
                      ob, ll, c->rep);
            if (L > cap)
                relax(cells, i, L,
                      mbase + ofp + P.ml_price[ml_code_exact(L - MINMATCH)],
                      ob, ll, c->rep);
        }

        /* matches: suffix-BST walk (btultra2) or hash-chain walk, plus the
           len >= 3 probe via hash3 inside find_matches (chain mode) */
        int nm = use_bt ? nm_bt
                        : find_matches(&C, base, pos, window_low, block_end,
                                       attempts, prev3, m);
        uint32_t from_len = MINMATCH;
        for (int k = 0; k < nm; k++) {
            uint32_t L = m[k].len;
            uint32_t d = m[k].dist;
            uint32_t ob = off_base(d, ll, c->rep);
            int64_t ofp = P.of_price[highbit(ob)];
            uint32_t cap = L < RELAX_CAP ? L : RELAX_CAP;
            for (uint32_t l = from_len; l <= cap; l++)
                relax(cells, i, l,
                      mbase + ofp + P.ml_price[ml_code_exact(l - MINMATCH)],
                      ob, ll, c->rep);
            if (L > cap)
                relax(cells, i, L,
                      mbase + ofp + P.ml_price[ml_code_exact(L - MINMATCH)],
                      ob, ll, c->rep);
            from_len = L + 1;
        }
    }

    if (iter + 1 < n_iters) {
        /* re-collect histograms from this parse for the next iteration */
        memset(P.lit, 0, sizeof(P.lit)); memset(P.llc, 0, sizeof(P.llc));
        memset(P.mlc, 0, sizeof(P.mlc)); memset(P.ofc, 0, sizeof(P.ofc));
        P.lit_tot = P.ll_tot = P.ml_tot = P.of_tot = 0;
        int64_t i = n;
        while (i > 0) {
            if (cells[i].price >= PINF) break;
            if (cells[i].ml > 0) {
                uint32_t ll = cells[i].ll, ml = cells[i].ml, ob = cells[i].ob;
                int64_t start = i - ml - ll;
                for (int64_t q = start; q < start + ll; q++)
                    P.lit[base[block_start + q]]++;
                P.lit_tot += ll;
                P.llc[ll_code_exact(ll)]++; P.ll_tot++;
                P.mlc[ml_code_exact(ml - MINMATCH)]++; P.ml_tot++;
                P.ofc[highbit(ob)]++; P.of_tot++;
                i = start;
            } else {
                P.lit[base[block_start + i - 1]]++;
                P.lit_tot++;
                i--;
            }
        }
        prices_rebuild_ex(&P, iter + 2 < n_iters
                          ? (int64_t)(3.5 * SCALE)
                          : (int64_t)(8.0 * SCALE));
    }
    }  /* iter loop */

    /* the final iteration left the block inserted (tail-gated): record it */
    X->ins_until = (block_end - 3 > X->ins_until) ? block_end - 3
                                                  : X->ins_until;

    /* backtrack */
    {
        int64_t nseq = 0, i = n;
        while (i > 0) {
            if (cells[i].price >= PINF) goto done;
            if (cells[i].ml > 0) { nseq++; i -= cells[i].ml + cells[i].ll; }
            else i--;
        }
        if (nseq > seq_cap) goto done;
        int64_t k = nseq;
        i = n;
        while (i > 0) {
            if (cells[i].ml > 0) {
                k--;
                ll_out[k] = (int32_t)cells[i].ll;
                ob_out[k] = (int32_t)cells[i].ob;
                mb_out[k] = (int32_t)(cells[i].ml - MINMATCH);
                i -= cells[i].ml + cells[i].ll;
            } else i--;
        }
        reps[0] = cells[n].rep[0];
        reps[1] = cells[n].rep[1];
        reps[2] = cells[n].rep[2];
        rc = nseq;
    }

done:
    free(cells); free(m);   /* matcher arrays live in the ctx */
    return rc;
}

/* single-shot compatibility wrapper (tests / no-ctx callers) */
int64_t zt_opt_parse(const uint8_t* base, int64_t window_low,
                     int64_t block_start, int64_t block_end,
                     uint32_t* reps,
                     int32_t* ll_out, int32_t* ob_out, int32_t* mb_out,
                     int64_t seq_cap,
                     int hash_log, int search_log, int min_match,
                     int target_len, int strategy) {
    void* x = zt_opt_ctx_new();
    if (!x) return -1;
    int64_t rc = zt_opt_parse_ctx(x, base, window_low, block_start,
                                  block_end, block_end, reps, ll_out,
                                  ob_out, mb_out, seq_cap, hash_log,
                                  search_log, min_match, target_len,
                                  strategy);
    zt_opt_ctx_free(x);
    return rc;
}
