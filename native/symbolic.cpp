// Native symbolic-analysis engine for sparsecholesky_tpu.
//
// TPU-native framework component replacing the reference's header-only C++
// symbolic layer (/root/reference/include/chol.hpp:378-946) for large
// matrices where the NumPy/Python implementation in symbolic.py is too
// slow.  Same classical algorithms (Liu elimination tree with path
// compression, youngest-child-first postorder, skeleton column counts,
// row-subtree reach fill), freshly implemented against flat C arrays and
// exposed with a C ABI for ctypes.
//
// Protocol (two calls, caller allocates):
//   1) sct_symbolic_analyze(n, Ap, Ai, parent, post, counts) -> nnz(L)
//   2) sct_symbolic_fill(n, Ap, Ai, parent, counts, Lp, Li)  -> 0 on success
//
// Input is the canonical upper-triangle CSC pattern (int64 colptr Ap,
// int32 row indices Ai).  Output pattern is lower CSC, columns sorted.

#include <algorithm>
#include <cstdint>
#include <iterator>
#include <vector>

extern "C" {

// Liu's elimination tree with ancestor path compression.
static void etree_impl(int64_t n, const int64_t* Ap, const int32_t* Ai,
                       int32_t* parent, std::vector<int32_t>& ancestor) {
    for (int64_t j = 0; j < n; ++j) {
        parent[j] = -1;
        ancestor[j] = -1;
    }
    for (int64_t k = 0; k < n; ++k) {
        for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
            int32_t i = Ai[p];
            while (i != -1 && i < (int32_t)k) {
                int32_t inext = ancestor[i];
                ancestor[i] = (int32_t)k;
                if (inext == -1) parent[i] = (int32_t)k;
                i = inext;
            }
        }
    }
}

// Iterative DFS postorder, youngest-child-first child lists.
static void post_order_impl(int64_t n, const int32_t* parent, int32_t* post,
                            std::vector<int32_t>& head,
                            std::vector<int32_t>& next,
                            std::vector<int32_t>& stack) {
    for (int64_t j = 0; j < n; ++j) head[j] = -1;
    for (int64_t j = n - 1; j >= 0; --j) {
        int32_t p = parent[j];
        if (p != -1) {
            next[j] = head[p];
            head[p] = (int32_t)j;
        }
    }
    int64_t k = 0;
    for (int64_t root = 0; root < n; ++root) {
        if (parent[root] != -1) continue;
        int64_t top = 0;
        stack[top] = (int32_t)root;
        while (top >= 0) {
            int32_t j = stack[top];
            int32_t child = head[j];
            if (child == -1) {
                post[k++] = j;
                --top;
            } else {
                head[j] = next[child];
                stack[++top] = child;
            }
        }
    }
}

// Skeleton column counts (first-descendant / maxfirst / prevleaf / LCA).
static void col_count_impl(int64_t n, const int64_t* Ap, const int32_t* Ai,
                           const int32_t* parent, const int32_t* post,
                           int64_t* counts) {
    std::vector<int64_t> first(n, -1), delta(n, 0);
    for (int64_t k = 0; k < n; ++k) {
        int64_t j = post[k];
        delta[j] = (first[j] == -1) ? 1 : 0;
        while (j != -1 && first[j] == -1) {
            first[j] = k;
            j = parent[j];
        }
    }
    // structural transpose of the upper pattern (counting sort)
    std::vector<int64_t> ATp(n + 1, 0);
    std::vector<int32_t> ATi(Ap[n]);
    for (int64_t p = 0; p < Ap[n]; ++p) ATp[Ai[p] + 1]++;
    for (int64_t j = 0; j < n; ++j) ATp[j + 1] += ATp[j];
    {
        std::vector<int64_t> cur(ATp.begin(), ATp.end() - 1);
        for (int64_t j = 0; j < n; ++j)
            for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p)
                ATi[cur[Ai[p]]++] = (int32_t)j;
    }
    std::vector<int64_t> maxfirst(n, -1), prevleaf(n, -1), ancestor(n);
    for (int64_t j = 0; j < n; ++j) ancestor[j] = j;
    for (int64_t k = 0; k < n; ++k) {
        int64_t j = post[k];
        int64_t pj = parent[j];
        if (pj != -1) delta[pj] -= 1;
        for (int64_t p = ATp[j]; p < ATp[j + 1]; ++p) {
            int64_t i = ATi[p];
            if (i <= j) continue;
            if (first[j] <= maxfirst[i]) continue;
            maxfirst[i] = first[j];
            int64_t jprev = prevleaf[i];
            prevleaf[i] = j;
            delta[j] += 1;
            if (jprev != -1) {
                int64_t q = jprev;
                while (q != ancestor[q]) q = ancestor[q];
                int64_t s = jprev;
                while (s != q) {
                    int64_t sp = ancestor[s];
                    ancestor[s] = q;
                    s = sp;
                }
                delta[q] -= 1;
            }
        }
        if (pj != -1) ancestor[j] = pj;
    }
    for (int64_t j = 0; j < n; ++j) counts[j] = delta[j];
    for (int64_t j = 0; j < n; ++j) {
        int64_t pj = parent[j];
        if (pj != -1) counts[pj] += counts[j];
    }
}

// Phase 1: etree + postorder + column counts.  Returns nnz(L).
int64_t sct_symbolic_analyze(int64_t n, const int64_t* Ap, const int32_t* Ai,
                             int32_t* parent, int32_t* post, int64_t* counts) {
    std::vector<int32_t> ws1(n), ws2(n), ws3(n);
    etree_impl(n, Ap, Ai, parent, ws1);
    post_order_impl(n, parent, post, ws1, ws2, ws3);
    col_count_impl(n, Ap, Ai, parent, post, counts);
    int64_t nnz = 0;
    for (int64_t j = 0; j < n; ++j) nnz += counts[j];
    return nnz;
}

// Phase 2: fill L's lower-CSC pattern (columns sorted: rows are appended in
// increasing k).  Lp must have n+1 slots, Li nnz(L) slots.
int32_t sct_symbolic_fill(int64_t n, const int64_t* Ap, const int32_t* Ai,
                          const int32_t* parent, const int64_t* counts,
                          int64_t* Lp, int32_t* Li) {
    Lp[0] = 0;
    for (int64_t j = 0; j < n; ++j) Lp[j + 1] = Lp[j] + counts[j];
    std::vector<int64_t> cursor(n);
    for (int64_t j = 0; j < n; ++j) {
        cursor[j] = Lp[j];
        Li[cursor[j]++] = (int32_t)j;  // diagonal first
    }
    std::vector<int32_t> w(n, -1), s(n);
    for (int64_t k = 0; k < n; ++k) {
        int64_t top = n;
        w[k] = (int32_t)k;
        for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
            int32_t i = Ai[p];
            if (i > (int32_t)k) continue;
            int64_t len = 0;
            while (w[i] != (int32_t)k) {
                s[len++] = i;
                w[i] = (int32_t)k;
                i = parent[i];
            }
            while (len > 0) s[--top] = s[--len];
        }
        for (int64_t t = top; t < n; ++t) {
            int64_t j = s[t];
            Li[cursor[j]++] = (int32_t)k;
        }
    }
    for (int64_t j = 0; j < n; ++j)
        if (cursor[j] != Lp[j + 1]) return 1;  // counts/fill mismatch
    return 0;
}

// Row unions per supernode: given L's pattern and supernode boundaries,
// emit the sorted union of row indices of each supernode's columns.
// rows_out is caller-allocated with capacity cap; returns total emitted or
// -1 if cap exceeded.  offsets_out[s] = start of supernode s's rows.
int64_t sct_supernode_rows(int64_t n, const int64_t* Lp, const int32_t* Li,
                           int64_t ns, const int64_t* sn_ptr,
                           int64_t* offsets_out, int32_t* rows_out,
                           int64_t cap) {
    std::vector<int32_t> mark(n, -1);
    int64_t out = 0;
    for (int64_t s = 0; s < ns; ++s) {
        offsets_out[s] = out;
        int64_t c0 = sn_ptr[s], c1 = sn_ptr[s + 1];
        // union preserving sortedness: merge column c0 (already sorted and a
        // superset start) then insert any extras from later columns, then sort
        int64_t start = out;
        for (int64_t j = c0; j < c1; ++j) {
            for (int64_t p = Lp[j]; p < Lp[j + 1]; ++p) {
                int32_t r = Li[p];
                if (mark[r] != (int32_t)s) {
                    mark[r] = (int32_t)s;
                    if (out >= cap) return -1;
                    rows_out[out++] = r;
                }
            }
        }
        // insertion sort is fine: lists are nearly sorted (col c0 dominates)
        for (int64_t a = start + 1; a < out; ++a) {
            int32_t v = rows_out[a];
            int64_t b = a - 1;
            while (b >= start && rows_out[b] > v) {
                rows_out[b + 1] = rows_out[b];
                --b;
            }
            rows_out[b + 1] = v;
        }
    }
    offsets_out[ns] = out;
    return out;
}

// ---------------------------------------------------------------------------
// One-shot supernodal analysis: etree + postorder + counts + fundamental
// supernodes + supernodal row sets + relaxed amalgamation, WITHOUT ever
// materializing the strict pattern of L (whose O(nnz(L)) random-scatter
// fill dominates host time for large matrices).
//
// Key structure fact used: for a fundamental supernode (column-replication
// test, /root/reference/src/chol.cpp:42-100), the row set of the supernode
// equals the pattern of its leading column, and the pattern of its LAST
// column x is {x} ∪ below(s).  Fill propagation along the elimination tree
// (pattern(parent[x]) ⊇ pattern(x) \ {x}) therefore reduces to: each
// supernode's row set = own columns ∪ A-rows of its columns ∪ below-rows of
// its assembly-tree children — O(supernodal nnz) total.

struct sct_result {
    int64_t n, ns, total_rows;
    int32_t* parent;
    int32_t* post;
    int64_t* counts;
    int64_t* sn_ptr;    // ns+1
    int64_t* row_off;   // ns+1
    int32_t* rows;      // total_rows
};

sct_result* sct_supernodal_analyze(int64_t n, const int64_t* Ap,
                                   const int32_t* Ai, double relax_ratio,
                                   int64_t small_sn, int64_t max_width,
                                   double small_ratio) {
    auto* res = new sct_result();
    res->n = n;
    res->parent = new int32_t[n];
    res->post = new int32_t[n];
    res->counts = new int64_t[n];
    {
        std::vector<int32_t> ws1(n), ws2(n), ws3(n);
        etree_impl(n, Ap, Ai, res->parent, ws1);
        post_order_impl(n, res->parent, res->post, ws1, ws2, ws3);
        col_count_impl(n, Ap, Ai, res->parent, res->post, res->counts);
    }
    const int32_t* parent = res->parent;
    const int64_t* counts = res->counts;

    // fundamental supernodes from (parent, counts) alone
    std::vector<int64_t> fptr;
    fptr.push_back(0);
    for (int64_t j = 1; j < n; ++j)
        if (!(parent[j - 1] == (int32_t)j && counts[j] == counts[j - 1] - 1))
            fptr.push_back(j);
    fptr.push_back(n);
    int64_t nf = (int64_t)fptr.size() - 1;
    std::vector<int32_t> fid(n);
    for (int64_t s = 0; s < nf; ++s)
        for (int64_t j = fptr[s]; j < fptr[s + 1]; ++j) fid[j] = (int32_t)s;

    // structural transpose of the upper pattern: per column j, the rows r>j
    // with A(j, r) != 0 (i.e. the lower pattern of column j)
    std::vector<int64_t> ATp(n + 1, 0);
    std::vector<int32_t> ATi(Ap[n]);
    for (int64_t p = 0; p < Ap[n]; ++p) ATp[Ai[p] + 1]++;
    for (int64_t j = 0; j < n; ++j) ATp[j + 1] += ATp[j];
    {
        std::vector<int64_t> cur(ATp.begin(), ATp.end() - 1);
        for (int64_t j = 0; j < n; ++j)
            for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p)
                ATi[cur[Ai[p]]++] = (int32_t)j;
    }

    // child-propagation row sets over fundamental supernodes
    std::vector<std::vector<int32_t>> srows(nf);
    std::vector<int32_t> chead(nf, -1), cnext(nf, -1);  // child lists
    std::vector<int32_t> mark(n, -1);
    for (int64_t s = 0; s < nf; ++s) {
        int64_t c0 = fptr[s], c1 = fptr[s + 1];
        auto& out = srows[s];
        out.reserve((size_t)(c1 - c0) + 8);
        for (int64_t j = c0; j < c1; ++j) {
            mark[j] = (int32_t)s;
            out.push_back((int32_t)j);
        }
        size_t tail = out.size();
        for (int64_t j = c0; j < c1; ++j)
            for (int64_t p = ATp[j]; p < ATp[j + 1]; ++p) {
                int32_t r = ATi[p];
                if (r >= (int32_t)c1 && mark[r] != (int32_t)s) {
                    mark[r] = (int32_t)s;
                    out.push_back(r);
                }
            }
        for (int32_t c = chead[s]; c != -1; c = cnext[c]) {
            int64_t cw = fptr[c + 1] - fptr[c];
            const auto& crows = srows[c];
            for (size_t t = (size_t)cw; t < crows.size(); ++t) {
                int32_t r = crows[t];
                if (r >= (int32_t)c1 && mark[r] != (int32_t)s) {
                    mark[r] = (int32_t)s;
                    out.push_back(r);
                }
            }
        }
        std::sort(out.begin() + tail, out.end());
        if (out.size() > (size_t)(c1 - c0)) {
            int32_t t = fid[out[c1 - c0]];  // owner of first below row
            cnext[s] = chead[t];
            chead[t] = (int32_t)s;
        }
    }

    // relaxed amalgamation (same greedy rule as symbolic.amalgamate):
    // merge s with its successor while columns are etree-linked and the
    // introduced explicit-zero fraction stays bounded.
    // Single accumulator pass (equivalent to repeatedly merging a segment
    // with its successor): absorb successors into the current segment while
    // the rule allows, else emit and restart from the successor.
    std::vector<int64_t> mstart, mend;
    std::vector<std::vector<int32_t>> mrows;
    std::vector<int32_t> tmp;
    if (nf > 0) {
        int64_t cur0 = fptr[0], cur1 = fptr[1];
        std::vector<int32_t> currows = std::move(srows[0]);
        for (int64_t s = 1; s < nf; ++s) {
            int64_t b1 = fptr[s + 1];
            bool merged = false;
            if (parent[cur1 - 1] == (int32_t)cur1) {
                int64_t wa = cur1 - cur0, wb = b1 - cur1, wn = wa + wb;
                if (wn <= max_width) {
                    const auto& rb = srows[s];
                    tmp.clear();
                    tmp.reserve(currows.size() + rb.size());
                    std::set_union(currows.begin(), currows.end(),
                                   rb.begin(), rb.end(),
                                   std::back_inserter(tmp));
                    double nz_old = (double)wa * currows.size() +
                                    (double)wb * rb.size();
                    double nz_new = (double)wn * tmp.size();
                    double waste =
                        (nz_new - nz_old) / (nz_new > 0 ? nz_new : 1);
                    if (waste <= relax_ratio ||
                        (wa <= small_sn && wb <= small_sn &&
                         waste <= small_ratio)) {
                        cur1 = b1;
                        currows.swap(tmp);
                        merged = true;
                    }
                }
            }
            if (!merged) {
                mstart.push_back(cur0);
                mend.push_back(cur1);
                mrows.push_back(std::move(currows));
                cur0 = fptr[s];
                cur1 = b1;
                currows = std::move(srows[s]);
            }
        }
        mstart.push_back(cur0);
        mend.push_back(cur1);
        mrows.push_back(std::move(currows));
    }

    int64_t ns = (int64_t)mstart.size();
    res->ns = ns;
    res->sn_ptr = new int64_t[ns + 1];
    res->row_off = new int64_t[ns + 1];
    int64_t total = 0;
    for (int64_t s = 0; s < ns; ++s) {
        res->sn_ptr[s] = mstart[s];
        res->row_off[s] = total;
        total += (int64_t)mrows[s].size();
    }
    res->sn_ptr[ns] = n;
    res->row_off[ns] = total;
    res->total_rows = total;
    res->rows = new int32_t[total > 0 ? total : 1];
    for (int64_t s = 0; s < ns; ++s)
        std::copy(mrows[s].begin(), mrows[s].end(),
                  res->rows + res->row_off[s]);
    return res;
}

// ---------------------------------------------------------------------------
// Approximate minimum-degree ordering (AMD, quotient-graph).
//
// The Amestoy-Davis-Duff scheme, freshly implemented on vector-of-vector
// adjacency (no reference counterpart: the reference never permutes —
// SURVEY.md "What the reference does NOT have").  Per pivot elimination:
//   * boundary Lp = alive(A_p) ∪ alive(∪_{e∋p} L_e); p's elements absorb
//   * one pass computes w(e) = |L_e \ Lp| for every element touching Lp
//   * A_u is pruned of Lp ∪ {p} (those edges are covered by the new
//     element, the classic fix for degree double-counting)
//   * approximate external degree
//       d_u = min(n-k, d_old + |Lp \ u|, |A_u| + |Lp \ u| + Σ_e w(e))
//   * aggressive absorption: w(e) = 0 means L_e ⊆ Lp, e dies
//   * supervariable detection: boundary vars with identical (pruned)
//     adjacency + element lists merge (mass elimination), weights nv[]
// All set sizes are nv-weighted.  Output: perm_out[k] = k-th eliminated
// original variable (merged vars emit contiguously after their pivot).

int32_t sct_amd_order(int64_t n, const int64_t* Ap, const int32_t* Ai,
                      int32_t* perm_out) {
    // symmetric adjacency without diagonal
    std::vector<std::vector<int32_t>> adj(n);
    for (int64_t j = 0; j < n; ++j)
        for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
            int32_t i = Ai[p];
            if (i == (int32_t)j) continue;
            adj[i].push_back((int32_t)j);
            adj[j].push_back(i);
        }
    std::vector<std::vector<int32_t>> elem_bound;  // element boundary lists
    std::vector<int64_t> esize;                    // Σ nv over alive members
    std::vector<int32_t> absorbed;                 // -1 alive, else absorber
    std::vector<int64_t> ew;                       // scratch w(e)
    std::vector<int32_t> estamp;
    std::vector<std::vector<int32_t>> var_elems(n);
    std::vector<int64_t> degree(n), nv(n, 1);
    std::vector<int32_t> stamp(n, -1), hstamp(n, -1), hhead(n + 1, -1),
        hnext(n, -1), merged_next(n, -1);
    std::vector<int64_t> inbucket(n);
    std::vector<std::vector<int32_t>> bucket(n + 1);
    for (int64_t v = 0; v < n; ++v) degree[v] = (int64_t)adj[v].size();
    for (int64_t v = 0; v < n; ++v) {
        int64_t d = degree[v] < n ? degree[v] : n;
        bucket[d].push_back((int32_t)v);
        inbucket[v] = d;
    }
    int64_t mind = 0, k = 0;
    int32_t cur_stamp = 0;
    std::vector<int32_t> Lp;
    while (k < n) {
        while (mind <= n && bucket[mind].empty()) ++mind;
        if (mind > n) return 1;
        int32_t p = bucket[mind].back();
        bucket[mind].pop_back();
        if (nv[p] <= 0 || inbucket[p] != mind) continue;  // stale/dead

        // ---- boundary Lp (alive, deduped via stamp; stamps Lp ∪ {p}) ----
        ++cur_stamp;
        stamp[p] = cur_stamp;
        Lp.clear();
        int64_t lpw = 0;
        for (int32_t u : adj[p])
            if (nv[u] > 0 && stamp[u] != cur_stamp) {
                stamp[u] = cur_stamp;
                Lp.push_back(u);
                lpw += nv[u];
            }
        for (int32_t e : var_elems[p]) {
            if (absorbed[e] >= 0) continue;
            for (int32_t u : elem_bound[e])
                if (nv[u] > 0 && stamp[u] != cur_stamp) {
                    stamp[u] = cur_stamp;
                    Lp.push_back(u);
                    lpw += nv[u];
                }
            absorbed[e] = (int32_t)elem_bound.size();  // p's elements die
        }

        // ---- emit pivot + its merged chain (mass elimination) ----------
        int64_t pw = nv[p];
        perm_out[k++] = p;
        for (int32_t m = merged_next[p]; m >= 0; m = merged_next[m])
            perm_out[k++] = m;
        nv[p] = 0;
        // shrink surviving elements that contained p
        for (int32_t e : var_elems[p])
            if (absorbed[e] < 0) esize[e] -= pw;
        var_elems[p].clear();
        adj[p].clear();
        if (Lp.empty()) continue;

        int32_t eid = (int32_t)elem_bound.size();
        elem_bound.push_back(Lp);
        esize.push_back(lpw);
        absorbed.push_back(-1);
        ew.push_back(0);
        estamp.push_back(-1);

        // ---- pass 1: w(e) = |L_e \ Lp| for elements touching Lp --------
        for (int32_t u : Lp)
            for (int32_t e : var_elems[u]) {
                if (absorbed[e] >= 0 || e == eid) continue;
                if (estamp[e] != cur_stamp) {
                    estamp[e] = cur_stamp;
                    ew[e] = esize[e];
                }
                ew[e] -= nv[u];
            }

        // ---- pass 2: prune A_u, rebuild E_u, approximate degree --------
        for (int32_t u : Lp) {
            auto& au = adj[u];
            size_t w = 0;
            int64_t adeg = 0;
            for (size_t r = 0; r < au.size(); ++r) {
                int32_t v = au[r];
                // drop dead vars AND members of Lp ∪ {p} (covered by eid)
                if (nv[v] > 0 && stamp[v] != cur_stamp) {
                    au[w++] = v;
                    adeg += nv[v];
                }
            }
            au.resize(w);
            auto& eu = var_elems[u];
            size_t we = 0;
            int64_t edeg = 0;
            for (size_t r = 0; r < eu.size(); ++r) {
                int32_t e = eu[r];
                if (absorbed[e] >= 0 || e == eid) continue;
                int64_t wcur = (estamp[e] == cur_stamp) ? ew[e] : esize[e];
                if (estamp[e] == cur_stamp && wcur <= 0) {
                    absorbed[e] = eid;  // aggressive: L_e ⊆ Lp
                    continue;
                }
                eu[we++] = e;
                edeg += wcur;
            }
            eu.resize(we);
            eu.push_back(eid);
            int64_t d = adeg + (lpw - nv[u]) + edeg;
            int64_t cap1 = n - k - nv[u];
            int64_t cap2 = degree[u] + (lpw - nv[u]);
            if (d > cap1) d = cap1;
            if (d > cap2) d = cap2;
            if (d < 0) d = 0;
            degree[u] = d;
        }

        // ---- pass 3: supervariable detection among Lp ------------------
        // hash on (pruned adjacency + element list); exact set compare via
        // fresh stamps (hpass pins the hash table's epoch — the compare
        // stamps below keep bumping cur_stamp past it)
        const int32_t hpass = ++cur_stamp;
        for (int32_t u : Lp) {
            if (nv[u] <= 0) continue;
            int64_t h = 0;
            for (int32_t v : adj[u]) h += v;
            for (int32_t e : var_elems[u]) h += (int64_t)e * 131;
            int32_t hb = (int32_t)(((uint64_t)h) % (uint64_t)n);
            if (hstamp[hb] != hpass) {
                hstamp[hb] = hpass;
                hhead[hb] = u;
                hnext[u] = -1;
                continue;
            }
            bool mergedflag = false;
            for (int32_t v = hhead[hb]; v >= 0; v = hnext[v]) {
                if (nv[v] <= 0) continue;
                if (adj[v].size() != adj[u].size()
                    || var_elems[v].size() != var_elems[u].size())
                    continue;
                ++cur_stamp;
                for (int32_t x : adj[v]) stamp[x] = cur_stamp;
                bool same = true;
                for (int32_t x : adj[u])
                    if (stamp[x] != cur_stamp) { same = false; break; }
                if (same) {
                    for (int32_t e : var_elems[v]) estamp[e] = cur_stamp;
                    for (int32_t e : var_elems[u])
                        if (estamp[e] != cur_stamp) { same = false; break; }
                }
                if (!same) continue;
                // merge u into v: weights add, u leaves the graph
                // (esize stays consistent: u's entries go dead with nv=0,
                // v carries the combined weight in the same boundaries)
                int32_t t = v;
                while (merged_next[t] >= 0) t = merged_next[t];
                merged_next[t] = u;
                int64_t wu = nv[u];
                nv[v] += wu;
                nv[u] = 0;
                // external degree excludes the merged-in weight (u and v
                // met only through eid, whose esize term counted wu)
                degree[v] = degree[v] > wu ? degree[v] - wu : 0;
                adj[u].clear();
                adj[u].shrink_to_fit();
                var_elems[u].clear();
                var_elems[u].shrink_to_fit();
                mergedflag = true;
                break;
            }
            if (!mergedflag) {
                hnext[u] = hhead[hb];
                hhead[hb] = u;
            }
        }

        // ---- requeue survivors -----------------------------------------
        for (int32_t u : Lp) {
            if (nv[u] <= 0) continue;
            int64_t d = degree[u] < n ? degree[u] : n;
            bucket[d].push_back(u);
            inbucket[u] = d;
            if (d < mind) mind = d;
        }
    }
    return 0;
}


void sct_free_result(sct_result* res) {
    if (!res) return;
    delete[] res->parent;
    delete[] res->post;
    delete[] res->counts;
    delete[] res->sn_ptr;
    delete[] res->row_off;
    delete[] res->rows;
    delete res;
}

}  // extern "C"
