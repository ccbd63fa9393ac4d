// molkit: native chemistry kernel for graphinvent-tpu preprocessing.
//
// Implements the preprocessing hot path -- SMILES parsing, kekulization,
// canonical ranking (WL refinement), BFS/DFS decoding-route ordering, and
// decoding-route replay with APD target construction -- with semantics
// IDENTICAL to the Python implementation in graphinvent_tpu/chem/ (which
// itself rebuilds graphinvent/MolecularGraph.py + DataProcesser.py).  The
// Python side loads this via ctypes (graphinvent_tpu/chem/native.py) and
// falls back to pure Python when the shared library is missing.
//
// Build:  g++ -O3 -shared -fPIC -std=c++17 -o libmolkit.so molkit.cc
//
// Exactness is enforced by tests/test_native.py: routes produced here must
// match the Python routes byte-for-byte over the gdb13 training set.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <map>
#include <set>
#include <string>
#include <thread>
#include <tuple>
#include <vector>

namespace {

struct Atom {
  std::string element;
  int charge = 0;
  int n_implicit_h = -1;  // -1: derive from valence model
  bool aromatic = false;
  bool chiral = false;    // chirality != "None" (decode path only; forces
                          // bracket form in the SMILES writer like
                          // chem/smiles.py _atom_token's plain_ok check)
};

struct Mol {
  std::vector<Atom> atoms;
  // bonds in creation order; type: 0=single 1=double 2=triple 3=aromatic
  std::vector<std::tuple<int, int, int>> bonds;

  int n() const { return (int)atoms.size(); }

  int bond_type(int i, int j) const {
    for (auto& [a, b, t] : bonds)
      if ((a == i && b == j) || (a == j && b == i)) return t;
    return -1;
  }
  int bond_index(int i, int j) const {
    for (size_t k = 0; k < bonds.size(); ++k) {
      auto& [a, b, t] = bonds[k];
      if ((a == i && b == j) || (a == j && b == i)) return (int)k;
    }
    return -1;
  }
  std::vector<int> neighbors(int i) const {
    std::vector<int> out;
    for (auto& [a, b, t] : bonds) {
      if (a == i) out.push_back(b);
      else if (b == i) out.push_back(a);
    }
    return out;
  }
  int degree(int i) const { return (int)neighbors(i).size(); }
};

// ---------------------------------------------------------------------------
// valence model (mirror of chem/molecule.py)
// ---------------------------------------------------------------------------

const std::map<std::string, std::vector<int>> kDefaultValences = {
    {"H", {1}},  {"B", {3}},  {"C", {4}},  {"N", {3}},  {"O", {2}},
    {"F", {1}},  {"Si", {4}}, {"P", {3, 5}}, {"S", {2, 4, 6}},
    {"Cl", {1}}, {"Br", {1}}, {"I", {1}},  {"Se", {2, 4, 6}},
};
const std::set<std::string> kChargeAdds = {"N", "O", "P", "S", "F",
                                           "Cl", "Br", "I", "Se", "H"};
const std::map<std::string, int> kAtomicNum = {
    {"H", 1},  {"B", 5},   {"C", 6},  {"N", 7},  {"O", 8},  {"F", 9},
    {"Si", 14}, {"P", 15}, {"S", 16}, {"Cl", 17}, {"Br", 35}, {"I", 53},
    {"Se", 34}};

std::vector<int> allowed_valences(const std::string& el, int charge) {
  auto it = kDefaultValences.find(el);
  if (it == kDefaultValences.end()) return {};
  if (charge == 0) return it->second;
  std::vector<int> out;
  if (kChargeAdds.count(el)) {
    for (int v : it->second)
      if (v + charge >= 0) out.push_back(v + charge);
  } else {
    for (int v : it->second)
      if (v - std::abs(charge) >= 0) out.push_back(v - std::abs(charge));
  }
  return out;
}

bool needs_double_bond(const Mol& m, int i);   // == molecule.needs_pi_bond

double explicit_valence(const Mol& m, int i) {
  // Aromatic bonds follow the toolkit rule (mirror of chem/molecule.py
  // explicit_valence): each ring bond counts 1, plus one pi contribution
  // when the atom donates a pi electron (needs_pi_bond) -- benzene C =
  // 2+1 = 3, ring-fusion C (naphthalene) = 3+1 = 4, but lone-pair donors
  // (pyrrole [nH], furan O) get just n_arom.  A flat 1.5/bond over-counts
  // fused systems; a flat n_arom+1 over-counts lone-pair donors.
  double total = 0;
  int n_arom = 0;
  for (auto& [a, b, t] : m.bonds) {
    if (a != i && b != i) continue;
    if (t == 3 && m.atoms[a].aromatic && m.atoms[b].aromatic) ++n_arom;
    else total += (t == 0 ? 1 : t == 1 ? 2 : t == 2 ? 3 : 1);
  }
  if (n_arom > 0) total += n_arom + (needs_double_bond(m, i) ? 1 : 0);
  return total;
}

int implicit_h(const Mol& m, int i) {
  const Atom& atom = m.atoms[i];
  if (atom.n_implicit_h >= 0) return atom.n_implicit_h;
  int ev = (int)std::ceil(explicit_valence(m, i));
  for (int v : allowed_valences(atom.element, atom.charge))
    if (v >= ev) return v - ev;
  return 0;
}

bool sanitize_ok(const Mol& m) {
  for (int i = 0; i < m.n(); ++i) {
    auto vals = allowed_valences(m.atoms[i].element, m.atoms[i].charge);
    if (vals.empty()) return false;
    double ev = explicit_valence(m, i);
    if (ev > *std::max_element(vals.begin(), vals.end())) return false;
    if (m.atoms[i].n_implicit_h >= 0) {
      if (ev + m.atoms[i].n_implicit_h >
          *std::max_element(vals.begin(), vals.end()))
        return false;
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// SMILES parser (mirror of chem/smiles.py)
// ---------------------------------------------------------------------------

const std::set<std::string> kOrganic = {"B", "C", "N", "O", "P",
                                        "S", "F", "Cl", "Br", "I"};
const std::map<char, std::string> kAromaticSym = {
    {'b', "B"}, {'c', "C"}, {'n', "N"}, {'o', "O"}, {'p', "P"}, {'s', "S"}};

bool parse_bracket(const std::string& body, Atom* atom, bool* aromatic) {
  size_t i = 0, n = body.size();
  while (i < n && isdigit(body[i])) ++i;  // isotope: parse + ignore
  *aromatic = false;
  std::string sym;
  if (i + 1 < n && (body.substr(i, 2) == "Cl" || body.substr(i, 2) == "Br" ||
                    body.substr(i, 2) == "Si" || body.substr(i, 2) == "Se")) {
    sym = body.substr(i, 2);
    i += 2;
  } else if (i + 1 < n && body.substr(i, 2) == "se") {
    sym = "Se"; *aromatic = true; i += 2;
  } else if (i < n && kAromaticSym.count(body[i])) {
    sym = kAromaticSym.at(body[i]); *aromatic = true; ++i;
  } else if (i < n && isalpha(body[i])) {
    sym = std::string(1, body[i]); ++i;
  } else {
    return false;
  }
  atom->element = sym;
  if (i < n && body[i] == '@') {
    ++i;
    if (i < n && body[i] == '@') ++i;
    while (i < n && isalnum(body[i]) && body[i] != 'H' && body[i] != '+' &&
           body[i] != '-') ++i;
  }
  atom->n_implicit_h = 0;
  if (i < n && body[i] == 'H') {
    ++i;
    atom->n_implicit_h = 1;
    if (i < n && isdigit(body[i])) { atom->n_implicit_h = body[i] - '0'; ++i; }
  }
  atom->charge = 0;
  while (i < n && (body[i] == '+' || body[i] == '-')) {
    int sign = body[i] == '+' ? 1 : -1;
    ++i;
    if (i < n && isdigit(body[i])) { atom->charge += sign * (body[i] - '0'); ++i; }
    else atom->charge += sign;
  }
  return i == n;
}

bool needs_double_bond(const Mol& m, int i) {
  const Atom& atom = m.atoms[i];
  for (int j : m.neighbors(i)) {
    int t = m.bond_type(i, j);
    if (t == 1 || t == 2) return false;
  }
  int degree = m.degree(i);
  int n_h = atom.n_implicit_h > 0 ? atom.n_implicit_h : 0;
  int sigma = degree + n_h;
  const std::string& el = atom.element;
  int q = atom.charge;
  if (el == "C") return q == 0 || sigma < 3;
  if (el == "N" || el == "P") {
    if (q == 1) return sigma <= 3 && n_h + degree <= 3;
    return sigma <= 2;
  }
  if (el == "O" || el == "S" || el == "Se") return q == 1;
  if (el == "B") return false;
  return sigma <= 2;
}

bool kekulize(Mol* m) {
  std::vector<int> arom;
  for (int i = 0; i < m->n(); ++i)
    if (m->atoms[i].aromatic) arom.push_back(i);
  if (arom.empty()) return true;
  std::vector<std::pair<int, int>> arom_bonds;
  for (auto& [a, b, t] : m->bonds)
    if (t == 3) arom_bonds.push_back({a, b});

  std::map<int, bool> needs;
  for (int i : arom) needs[i] = needs_double_bond(*m, i);

  std::map<int, std::vector<int>> adj;
  for (int i : arom) adj[i] = {};
  for (auto& [a, b] : arom_bonds) {
    if (adj.count(a) && adj.count(b)) {
      adj[a].push_back(b);
      adj[b].push_back(a);
    }
  }
  std::vector<int> need_atoms;
  for (int i : arom)
    if (needs[i]) need_atoms.push_back(i);
  // order: ascending count of needy neighbors (stable, like Python sorted)
  std::stable_sort(need_atoms.begin(), need_atoms.end(), [&](int x, int y) {
    auto cnt = [&](int u) {
      int c = 0;
      for (int v : adj[u])
        if (needs.count(v) && needs[v]) ++c;
      return c;
    };
    return cnt(x) < cnt(y);
  });

  std::map<int, int> matched;
  std::function<bool(size_t)> backtrack = [&](size_t pos) -> bool {
    while (pos < need_atoms.size() && matched.count(need_atoms[pos])) ++pos;
    if (pos == need_atoms.size()) return true;
    int u = need_atoms[pos];
    for (int v : adj[u]) {
      if (needs.count(v) && needs[v] && !matched.count(v)) {
        matched[u] = v;
        matched[v] = u;
        if (backtrack(pos + 1)) return true;
        matched.erase(u);
        matched.erase(v);
      }
    }
    return false;
  };
  if (!backtrack(0)) return false;

  for (auto& [a, b] : arom_bonds) {
    int idx = m->bond_index(a, b);
    auto& [x, y, t] = m->bonds[idx];
    t = (matched.count(a) && matched[a] == b) ? 1 : 0;
  }
  for (int i : arom) m->atoms[i].aromatic = false;
  return true;
}

bool parse_smiles(const std::string& smiles, Mol* mol,
                  bool kekulize_mol = true) {
  std::vector<int> branch;
  int prev = -1;
  int pending_bond = -2;  // -2: none
  std::map<int, std::pair<int, int>> ring_open;  // num -> (atom, bond)
  std::vector<bool> arom_flags;

  size_t i = 0, n = smiles.size();
  while (i < n) {
    char ch = smiles[i];
    if (ch == '(') {
      if (prev < 0) return false;
      branch.push_back(prev);
      ++i;
      continue;
    }
    if (ch == ')') {
      if (branch.empty()) return false;
      prev = branch.back();
      branch.pop_back();
      ++i;
      continue;
    }
    if (ch == '-' || ch == '/' || ch == '\\') { pending_bond = 0; ++i; continue; }
    if (ch == '=') { pending_bond = 1; ++i; continue; }
    if (ch == '#') { pending_bond = 2; ++i; continue; }
    if (ch == ':') { pending_bond = 3; ++i; continue; }
    if (ch == '.') { prev = -1; pending_bond = -2; ++i; continue; }
    if (isdigit(ch) || ch == '%') {
      int num;
      if (ch == '%') {
        if (i + 2 >= n) return false;
        num = (smiles[i + 1] - '0') * 10 + (smiles[i + 2] - '0');
        i += 3;
      } else {
        num = ch - '0';
        ++i;
      }
      if (prev < 0) return false;
      auto it = ring_open.find(num);
      if (it != ring_open.end()) {
        auto [open_atom, open_bond] = it->second;
        ring_open.erase(it);
        int bond = pending_bond != -2 ? pending_bond : open_bond;
        if (bond == -2)
          bond = (arom_flags[open_atom] && arom_flags[prev]) ? 3 : 0;
        if (open_atom == prev) return false;
        if (mol->bond_type(open_atom, prev) >= 0) return false;
        mol->bonds.push_back({open_atom, prev, bond});
      } else {
        ring_open[num] = {prev, pending_bond};
      }
      pending_bond = -2;
      continue;
    }
    Atom atom;
    bool aromatic = false;
    if (ch == '[') {
      size_t end = smiles.find(']', i);
      if (end == std::string::npos) return false;
      if (!parse_bracket(smiles.substr(i + 1, end - i - 1), &atom, &aromatic))
        return false;
      i = end + 1;
    } else {
      std::string two = smiles.substr(i, 2);
      if (two == "Cl" || two == "Br") {
        atom.element = two;
        atom.n_implicit_h = -1;
        i += 2;
      } else if (kOrganic.count(std::string(1, ch))) {
        atom.element = std::string(1, ch);
        atom.n_implicit_h = -1;
        ++i;
      } else if (kAromaticSym.count(ch)) {
        atom.element = kAromaticSym.at(ch);
        atom.n_implicit_h = -1;
        aromatic = true;
        ++i;
      } else {
        return false;
      }
    }
    atom.aromatic = aromatic;
    mol->atoms.push_back(atom);
    arom_flags.push_back(aromatic);
    int idx = mol->n() - 1;
    if (prev >= 0) {
      int bond = pending_bond;
      if (bond == -2) bond = (arom_flags[prev] && aromatic) ? 3 : 0;
      if (mol->bond_type(prev, idx) >= 0) return false;
      mol->bonds.push_back({prev, idx, bond});
    }
    prev = idx;
    pending_bond = -2;
  }
  if (!ring_open.empty() || !branch.empty()) return false;

  bool any_arom = false;
  for (auto& a : mol->atoms) any_arom |= a.aromatic;
  if (kekulize_mol && any_arom && !kekulize(mol)) return false;
  if (!kekulize_mol) {
    // aromatic-mode parse keeps type-3 bonds, but validity still requires
    // a kekule structure to exist.  Trigger on aromatic BONDS, exactly
    // like the Python mirror (molecule.sanitize checks `t == 3`): an
    // aromatic-flagged atom with no aromatic bond (degenerate input like
    // a lone 'c') is skipped by both paths.
    bool any_arom_bond = false;
    for (auto& [a, b, t] : mol->bonds)
      if (t == 3) { any_arom_bond = true; break; }
    if (any_arom_bond) {
      Mol kek = *mol;
      if (!kekulize(&kek)) return false;
    }
  }
  return sanitize_ok(*mol);
}

// ---------------------------------------------------------------------------
// rings + canonical ranks (mirror of chem/molecule.py rings + chem/canon.py)
// ---------------------------------------------------------------------------

std::vector<std::vector<int>> find_rings(const Mol& m) {
  int n = m.n();
  std::vector<std::vector<int>> adj(n);
  for (auto& [a, b, t] : m.bonds) {
    adj[a].push_back(b);
    adj[b].push_back(a);
  }
  // connected components
  int n_comp = 0;
  {
    std::vector<bool> seen(n, false);
    for (int s = 0; s < n; ++s) {
      if (seen[s]) continue;
      ++n_comp;
      std::vector<int> stack{s};
      seen[s] = true;
      while (!stack.empty()) {
        int u = stack.back();
        stack.pop_back();
        for (int v : adj[u])
          if (!seen[v]) { seen[v] = true; stack.push_back(v); }
      }
    }
  }
  int expected = (int)m.bonds.size() - n + n_comp;
  std::vector<std::vector<int>> out;
  if (expected <= 0) return out;

  auto shortest_cycle = [&](int a, int b) -> std::vector<int> {
    std::map<int, int> prevm;
    prevm[a] = -1;
    std::vector<int> dq{a};
    size_t head = 0;
    while (head < dq.size()) {
      int u = dq[head++];
      for (int v : adj[u]) {
        if (u == a && v == b) continue;
        if (!prevm.count(v)) {
          prevm[v] = u;
          if (v == b) {
            std::vector<int> path{v};
            while (path.back() != a) path.push_back(prevm[path.back()]);
            return path;
          }
          dq.push_back(v);
        }
      }
    }
    return {};
  };

  // candidates: shortest cycle through each bond (sorted bond order as in
  // Python, which iterates sorted(self._bonds))
  std::vector<std::pair<int, int>> keys;
  for (auto& [a, b, t] : m.bonds)
    keys.push_back({std::min(a, b), std::max(a, b)});
  std::sort(keys.begin(), keys.end());
  std::vector<std::vector<int>> candidates;
  std::set<std::set<int>> seen_rings;
  for (auto& [a, b] : keys) {
    auto ring = shortest_cycle(a, b);
    if (ring.empty()) continue;
    std::set<int> key(ring.begin(), ring.end());
    if (!seen_rings.count(key)) {
      seen_rings.insert(key);
      candidates.push_back(ring);
    }
  }
  std::stable_sort(candidates.begin(), candidates.end(),
                   [](auto& x, auto& y) { return x.size() < y.size(); });
  std::map<std::pair<int, int>, int> bond_ids;
  for (size_t k = 0; k < keys.size(); ++k) bond_ids[keys[k]] = (int)k;
  // GF(2) independence with 128-bit-safe vector<uint64_t> bitmasks
  int words = ((int)keys.size() + 63) / 64;
  std::map<int, std::vector<uint64_t>> pivots;  // pivot bit -> vec
  auto lowest_bit = [&](const std::vector<uint64_t>& v) -> int {
    for (int w = 0; w < words; ++w)
      if (v[w]) return w * 64 + __builtin_ctzll(v[w]);
    return -1;
  };
  for (auto& ring : candidates) {
    std::vector<uint64_t> vec(words, 0);
    for (size_t k = 0; k < ring.size(); ++k) {
      int a = ring[k], b = ring[(k + 1) % ring.size()];
      int id = bond_ids[{std::min(a, b), std::max(a, b)}];
      vec[id / 64] |= 1ull << (id % 64);
    }
    while (true) {
      int low = lowest_bit(vec);
      if (low < 0) break;
      auto it = pivots.find(low);
      if (it == pivots.end()) break;
      for (int w = 0; w < words; ++w) vec[w] ^= it->second[w];
    }
    int low = lowest_bit(vec);
    if (low >= 0) {
      out.push_back(ring);
      pivots[low] = vec;
    }
    if ((int)out.size() == expected) break;
  }
  return out;
}

std::vector<int> refine(const Mol& m, std::vector<int> classes) {
  int n = m.n();
  std::vector<std::vector<std::pair<int, int>>> nbrs(n);
  for (auto& [a, b, t] : m.bonds) {
    nbrs[a].push_back({t, b});
    nbrs[b].push_back({t, a});
  }
  while (true) {
    std::vector<std::pair<int, std::vector<std::pair<int, int>>>> sig(n);
    for (int i = 0; i < n; ++i) {
      std::vector<std::pair<int, int>> neigh;
      for (auto& [t, j] : nbrs[i]) neigh.push_back({t, classes[j]});
      std::sort(neigh.begin(), neigh.end());
      sig[i] = {classes[i], neigh};
    }
    std::vector<int> order(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int x, int y) { return sig[x] < sig[y]; });
    std::vector<int> nc(n);
    int rank = 0;
    for (int k = 0; k < n; ++k) {
      if (k > 0 && sig[order[k]] != sig[order[k - 1]]) rank = k;
      nc[order[k]] = rank;
    }
    if (nc == classes) return classes;
    classes = nc;
  }
}

std::vector<int> canonical_ranks(const Mol& m) {
  int n = m.n();
  if (n == 0) return {};
  std::vector<bool> in_ring(n, false);
  for (auto& ring : find_rings(m))
    for (int i : ring) in_ring[i] = true;
  using Inv = std::tuple<int, int, int, int, int, int>;
  std::vector<Inv> inv(n);
  for (int i = 0; i < n; ++i) {
    auto it = kAtomicNum.find(m.atoms[i].element);
    inv[i] = {m.degree(i), it == kAtomicNum.end() ? 0 : it->second,
              m.atoms[i].charge, implicit_h(m, i), in_ring[i] ? 1 : 0,
              m.atoms[i].aromatic ? 1 : 0};
  }
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int x, int y) { return inv[x] < inv[y]; });
  std::vector<int> classes(n);
  int rank = 0;
  for (int k = 0; k < n; ++k) {
    if (k > 0 && inv[order[k]] != inv[order[k - 1]]) rank = k;
    classes[order[k]] = rank;
  }
  classes = refine(m, classes);

  while (true) {
    std::map<int, int> counts;
    for (int c : classes) counts[c]++;
    int target = -1;
    for (auto& [c, k] : counts)
      if (k > 1) { target = c; break; }
    if (target < 0) break;
    int chosen = -1;
    for (int i = 0; i < n; ++i)
      if (classes[i] == target) { chosen = i; break; }
    for (int i = 0; i < n; ++i) {
      if (classes[i] > target || (classes[i] == target && i != chosen))
        classes[i] += 1;
    }
    classes = refine(m, classes);
  }
  std::vector<int> order2(n), ranks(n);
  for (int i = 0; i < n; ++i) order2[i] = i;
  std::stable_sort(order2.begin(), order2.end(),
                   [&](int x, int y) { return classes[x] < classes[y]; });
  for (int pos = 0; pos < n; ++pos) ranks[order2[pos]] = pos;
  return ranks;
}

// ---------------------------------------------------------------------------
// BFS/DFS ordering (mirror of chem/molgraph.py)
// ---------------------------------------------------------------------------

std::vector<int> bfs_ordering(const std::vector<std::vector<int>>& nbrs,
                              int n_nodes, const std::vector<int>& ranking,
                              int init) {
  std::vector<int> visited{init};
  std::set<int> vset{init};
  std::vector<int> frontier{init};
  while ((int)visited.size() < n_nodes) {
    std::vector<int> next_frontier;
    std::vector<int> sorted_frontier = frontier;
    std::sort(sorted_frontier.begin(), sorted_frontier.end());
    for (int node : sorted_frontier) {
      std::vector<int> fresh;
      for (int v : nbrs[node]) {
        if (!vset.count(v) &&
            std::find(next_frontier.begin(), next_frontier.end(), v) ==
                next_frontier.end() &&
            std::find(fresh.begin(), fresh.end(), v) == fresh.end())
          fresh.push_back(v);
      }
      std::stable_sort(fresh.begin(), fresh.end(),
                       [&](int x, int y) { return ranking[x] > ranking[y]; });
      for (int v : fresh) next_frontier.push_back(v);
    }
    std::vector<int> ordered;
    for (int v : next_frontier) {
      if (!vset.count(v)) {
        vset.insert(v);
        ordered.push_back(v);
      }
    }
    if (ordered.empty()) return {};  // disconnected
    for (int v : ordered) visited.push_back(v);
    frontier = ordered;
  }
  return visited;
}

std::vector<int> dfs_ordering(const std::vector<std::vector<int>>& nbrs,
                              int n_nodes, const std::vector<int>& ranking,
                              int init) {
  std::vector<int> visited{init};
  std::set<int> vset{init};
  int last = init;
  while ((int)visited.size() < n_nodes) {
    std::vector<int> fresh;
    for (int v : nbrs[last])
      if (!vset.count(v)) fresh.push_back(v);
    if (fresh.empty()) {
      auto it = std::find(visited.begin(), visited.end(), last);
      int idx = (int)(it - visited.begin());
      last = visited[idx - 1 >= 0 ? idx - 1 : 0];
      continue;
    }
    int best = fresh[0];
    for (int v : fresh)
      if (ranking[v] > ranking[best]) best = v;
    visited.push_back(best);
    vset.insert(best);
    last = best;
  }
  return visited;
}

// ---------------------------------------------------------------------------
// graph tensors -> molecule -> validity + canonical SMILES  (decode path)
//
// Mirrors chem/molgraph.py graph_to_mol + MolGraph.is_valid/get_smiles and
// chem/smiles.py perceive_aromaticity/mol_to_smiles byte-for-byte; the host
// boundary of generation (reference: GraphGenerator.py:659-804, which calls
// RDKit there).  Exactness enforced by tests/test_native.py decode tests.
// ---------------------------------------------------------------------------

std::vector<std::vector<int>> connected_components(const Mol& m) {
  // mirror of molecule.connected_components: discovery from index 0 up,
  // each component sorted
  int n = m.n();
  std::vector<std::vector<int>> adj(n);
  for (auto& [a, b, t] : m.bonds) {
    adj[a].push_back(b);
    adj[b].push_back(a);
  }
  std::vector<bool> seen(n, false);
  std::vector<std::vector<int>> comps;
  for (int s = 0; s < n; ++s) {
    if (seen[s]) continue;
    std::vector<int> stack{s}, comp;
    seen[s] = true;
    while (!stack.empty()) {
      int u = stack.back();
      stack.pop_back();
      comp.push_back(u);
      for (int v : adj[u])
        if (!seen[v]) { seen[v] = true; stack.push_back(v); }
    }
    std::sort(comp.begin(), comp.end());
    comps.push_back(comp);
  }
  return comps;
}

// pi electrons one ring contributes, or -1 if a ring atom cannot participate
// (mirror of chem/smiles.py _ring_pi_electrons)
int ring_pi_electrons(const Mol& m, const std::vector<int>& ring,
                      const std::set<int>& all_ring_atoms) {
  int total = 0;
  for (int i : ring) {
    const Atom& atom = m.atoms[i];
    bool dbl_in_ring = false, dbl_exo = false;
    for (int j : m.neighbors(i)) {
      int t = m.bond_type(i, j);
      bool in_sys = all_ring_atoms.count(j) > 0;
      if ((t == 1 || t == 3) && in_sys) dbl_in_ring = true;
      if ((t == 1 || t == 2) && !in_sys) dbl_exo = true;
    }
    const std::string& el = atom.element;
    int q = atom.charge;
    if (dbl_in_ring) total += 1;
    else if (dbl_exo) total += 0;
    else if ((el == "N" || el == "P") && q == 0) total += 2;
    else if ((el == "O" || el == "S" || el == "Se") && q == 0) total += 2;
    else if ((el == "N" || el == "P") && q == 1) return -1;
    else if (el == "C" && q == -1) total += 2;
    else if (el == "C" && q == 1) total += 0;
    else return -1;
  }
  return total;
}

void set_bond_type(Mol* m, int i, int j, int type) {
  int idx = m->bond_index(i, j);
  if (idx < 0) return;  // python raises KeyError; decode rings always bonded
  std::get<2>(m->bonds[idx]) = type;
}

// mirror of chem/smiles.py perceive_aromaticity (simplified Hueckel model)
void perceive_aromaticity(Mol* m) {
  auto rings = find_rings(*m);
  std::set<int> all_ring_atoms;
  for (auto& r : rings) all_ring_atoms.insert(r.begin(), r.end());
  std::set<int> aromatic_atoms;
  for (auto& ring : rings) {
    int pi = ring_pi_electrons(*m, ring, all_ring_atoms);
    if (pi >= 0 && pi % 4 == 2) aromatic_atoms.insert(ring.begin(), ring.end());
  }
  for (int i : aromatic_atoms) m->atoms[i].aromatic = true;
  for (auto& ring : rings) {
    bool subset = true;
    for (int i : ring)
      if (!aromatic_atoms.count(i)) { subset = false; break; }
    if (!subset) continue;
    for (size_t k = 0; k < ring.size(); ++k)
      set_bond_type(m, ring[k], ring[(k + 1) % ring.size()], 3);
  }
}

// mirror of chem/smiles.py _atom_token.  Non-const: the plain-form check
// probes the valence model with the declared H count cleared.
std::string atom_token(Mol& m, int i) {
  Atom& atom = m.atoms[i];
  const std::string& el = atom.element;
  std::string sym = el;
  if (atom.aromatic)
    for (auto& c : sym) c = (char)tolower(c);
  int n_h = implicit_h(m, i);
  bool plain_ok = kOrganic.count(el) > 0 && atom.charge == 0 && !atom.chiral;
  if (plain_ok && atom.n_implicit_h < 0) return sym;
  if (plain_ok && atom.n_implicit_h >= 0) {
    int probe = atom.n_implicit_h;
    atom.n_implicit_h = -1;
    int derived = implicit_h(m, i);
    atom.n_implicit_h = probe;
    if (derived == probe) return sym;
  }
  std::string body = sym;
  if (n_h == 1) body += "H";
  else if (n_h > 1) body += "H" + std::to_string(n_h);
  if (atom.charge == 1) body += "+";
  else if (atom.charge == -1) body += "-";
  else if (atom.charge > 1) body += "+" + std::to_string(atom.charge);
  else if (atom.charge < -1) body += "-" + std::to_string(-atom.charge);
  return "[" + body + "]";
}

// mirror of chem/smiles.py _write_smiles/_write_component
std::string write_smiles(Mol& m, const std::vector<int>& ranks) {
  int n = m.n();
  auto comps = connected_components(m);
  std::stable_sort(comps.begin(), comps.end(),
                   [&](const std::vector<int>& x, const std::vector<int>& y) {
                     auto mn = [&](const std::vector<int>& c) {
                       int best = ranks[c[0]];
                       for (int i : c) best = std::min(best, ranks[i]);
                       return best;
                     };
                     return mn(x) < mn(y);
                   });
  std::vector<bool> visited(n, false);
  int ring_counter = 0;
  std::string out;
  bool first = true;
  for (auto& comp : comps) {
    int root = comp[0];
    for (int i : comp)
      if (ranks[i] < ranks[root]) root = i;

    // pass 1: DFS spanning tree in canonical-rank order; back edges become
    // ring closures (detected at the deeper endpoint)
    std::vector<int> parent(n, -2);
    std::vector<std::vector<int>> children(n);
    std::vector<std::pair<int, int>> back_edges;
    std::set<std::pair<int, int>> back_set;
    parent[root] = -1;
    std::function<void(int)> dfs = [&](int u) {
      visited[u] = true;
      std::vector<int> nb = m.neighbors(u);
      std::stable_sort(nb.begin(), nb.end(),
                       [&](int x, int y) { return ranks[x] < ranks[y]; });
      for (int v : nb) {
        if (visited[v]) {
          if (v != parent[u]) {
            auto ekey = u < v ? std::make_pair(u, v) : std::make_pair(v, u);
            if (!back_set.count(ekey)) {
              back_set.insert(ekey);
              back_edges.push_back(ekey);
            }
          }
        } else {
          parent[v] = u;
          children[u].push_back(v);
          dfs(v);
        }
      }
    };
    dfs(root);

    std::map<int, std::vector<std::pair<int, int>>> atom_rings;
    std::map<std::pair<int, int>, int> ring_digit;
    for (auto& ekey : back_edges) {
      ring_digit[ekey] = ++ring_counter;
      atom_rings[ekey.first].push_back(ekey);
      atom_rings[ekey.second].push_back(ekey);
    }

    std::string piece;
    std::set<std::pair<int, int>> opened;
    auto bond_str = [&](int t, int a, int b) -> std::string {
      if (t == 1) return "=";
      if (t == 2) return "#";
      if (t == 3 && !(m.atoms[a].aromatic && m.atoms[b].aromatic)) return "-";
      return "";
    };
    std::function<void(int, int)> emit = [&](int u, int from_atom) {
      if (from_atom >= 0)
        piece += bond_str(m.bond_type(from_atom, u), from_atom, u);
      piece += atom_token(m, u);
      auto it = atom_rings.find(u);
      if (it != atom_rings.end()) {
        for (auto& ekey : it->second) {
          int other = ekey.first == u ? ekey.second : ekey.first;
          int digit = ring_digit[ekey];
          if (!opened.count(ekey)) {  // opening occurrence carries the symbol
            opened.insert(ekey);
            piece += bond_str(m.bond_type(u, other), u, other);
          }
          if (digit < 10) piece += std::to_string(digit);
          else {  // python: f"%{digit:02d}"
            std::string d = std::to_string(digit);
            piece += "%" + (d.size() < 2 ? "0" + d : d);
          }
        }
      }
      auto& kids = children[u];
      for (size_t idx = 0; idx < kids.size(); ++idx) {
        if (idx + 1 < kids.size()) {
          piece += "(";
          emit(kids[idx], u);
          piece += ")";
        } else {
          emit(kids[idx], u);
        }
      }
    };
    emit(root, -1);
    if (!first) out += ".";
    out += piece;
    first = false;
  }
  return out;
}

// mirror of chem/smiles.py mol_to_smiles (canonical=True, aromatic=True).
// Returns false for the python path's ``None`` (empty molecule).
bool mol_to_smiles(const Mol& mol, std::string* out) {
  if (mol.n() == 0) return false;
  Mol work = mol;  // python copies before perceiving aromaticity
  bool any_arom = false;
  for (auto& a : work.atoms) any_arom |= a.aromatic;
  if (!any_arom) perceive_aromaticity(&work);
  auto ranks = canonical_ranks(work);
  *out = write_smiles(work, ranks);
  return true;
}

// mirror of chem/molgraph.py graph_to_mol.  Returns false when python would
// return None or raise (caught by MolGraph.molecule -> molecule is None).
bool tensors_to_mol(const int8_t* nodes, const int8_t* edges, int n_nodes,
                    int M, int n_edge_types,
                    const std::vector<std::string>& atom_types,
                    const int* charges, int n_charges, const int* imp_hs,
                    int n_imp_h, int n_chirality, int chirality_none_idx,
                    Mol* mol) {
  if (n_nodes <= 0) return false;
  int n_at = (int)atom_types.size();
  int n_feat = n_at + n_charges + n_imp_h + n_chirality;
  // python list indexing wraps one negative step (lst[-k]); mirror exactly
  auto wrap = [](int idx, int len) -> int {
    if (idx < -len || idx >= len) return -1;  // IndexError -> mol is None
    return idx < 0 ? idx + len : idx;
  };
  for (int v = 0; v < n_nodes; ++v) {
    const int8_t* fv = nodes + (size_t)v * n_feat;
    std::vector<int> nz;
    for (int c = 0; c < n_feat; ++c)
      if (fv[c]) nz.push_back(c);
    if ((int)nz.size() < 2) return false;
    Atom atom;
    if (nz[0] >= n_at) return false;  // IndexError (non-negative index)
    atom.element = atom_types[nz[0]];
    int ci = wrap(nz[1] - n_at, n_charges);
    if (ci < 0) return false;
    atom.charge = charges[ci];
    int offset = n_at + n_charges, seg = 2;
    if (n_imp_h > 0) {
      if ((int)nz.size() <= seg) return false;  // IndexError on nz[seg]
      int hi = wrap(nz[seg] - offset, n_imp_h);
      if (hi < 0) return false;
      atom.n_implicit_h = imp_hs[hi];
      offset += n_imp_h;
      ++seg;
    }
    if (n_chirality > 0) {
      if ((int)nz.size() <= seg) return false;
      int ki = wrap(nz[seg] - offset, n_chirality);
      if (ki < 0) return false;
      atom.chiral = ki != chirality_none_idx;
    }
    mol->atoms.push_back(atom);
  }
  // bonds: numpy nonzero C-order over [n, n, E]; added once when a < b
  // (duplicate bond -> ValueError -> mol is None)
  std::vector<int8_t> bonded((size_t)n_nodes * n_nodes, 0);
  for (int a = 0; a < n_nodes; ++a) {
    for (int b = 0; b < n_nodes; ++b) {
      const int8_t* row = edges + ((size_t)a * M + b) * n_edge_types;
      for (int t = 0; t < n_edge_types; ++t) {
        if (!row[t] || a >= b) continue;
        if (bonded[(size_t)a * n_nodes + b]) return false;  // duplicate
        bonded[(size_t)a * n_nodes + b] = 1;
        mol->bonds.push_back({a, b, t});
        if (t == 3) {  // aromatic bond (use_aromatic_bonds mode)
          mol->atoms[a].aromatic = true;
          mol->atoms[b].aromatic = true;
        }
      }
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// molecular descriptors + QED (mirror of chem/descriptors.py; used by the
// RL scoring hot path -- reference ScoringFunction.py:131-143 calls RDKit's
// QED here).  Same ADS parameters (Bickerton et al. 2012), same simplified
// descriptor definitions; byte-level parity enforced by tests/test_native.py.
// ---------------------------------------------------------------------------

const std::map<std::string, double> kAtomicMass = {
    {"H", 1.008},  {"B", 10.81},  {"C", 12.011}, {"N", 14.007},
    {"O", 15.999}, {"F", 18.998}, {"Si", 28.085}, {"P", 30.974},
    {"S", 32.06},  {"Cl", 35.45}, {"Br", 79.904}, {"I", 126.904},
    {"Se", 78.971}};

double mol_weight_of(const Mol& m) {
  double total = 0.0;
  for (int i = 0; i < m.n(); ++i) {
    auto it = kAtomicMass.find(m.atoms[i].element);
    total += it == kAtomicMass.end() ? 0.0 : it->second;
    total += 1.008 * implicit_h(m, i);
  }
  return total;
}

bool is_amide_n(const Mol& m, int i) {
  if (m.atoms[i].element != "N") return false;
  for (int j : m.neighbors(i)) {
    if (m.atoms[j].element != "C") continue;
    for (int k : m.neighbors(j))
      if (k != i && m.atoms[k].element == "O" && m.bond_type(j, k) == 1)
        return true;
  }
  return false;
}

int hba_of(const Mol& m) {
  int count = 0;
  for (int i = 0; i < m.n(); ++i) {
    const Atom& atom = m.atoms[i];
    if (atom.element == "O") {
      ++count;
    } else if (atom.element == "N") {
      if (atom.aromatic && implicit_h(m, i) > 0) continue;  // pyrrole NH
      if (is_amide_n(m, i)) continue;
      ++count;
    }
  }
  return count;
}

int hbd_of(const Mol& m) {
  int total = 0;
  for (int i = 0; i < m.n(); ++i)
    if (m.atoms[i].element == "N" || m.atoms[i].element == "O")
      total += implicit_h(m, i);
  return total;
}

int rotatable_bonds_of(const Mol& m) {
  std::set<std::pair<int, int>> ring_bonds;
  for (auto& ring : find_rings(m))
    for (size_t k = 0; k < ring.size(); ++k) {
      int a = ring[k], b = ring[(k + 1) % ring.size()];
      ring_bonds.insert({std::min(a, b), std::max(a, b)});
    }
  auto amide = [&](int c, int n) {
    if (m.atoms[c].element != "C" || m.atoms[n].element != "N") return false;
    for (int k : m.neighbors(c))
      if (m.atoms[k].element == "O" && m.bond_type(c, k) == 1) return true;
    return false;
  };
  int count = 0;
  for (auto& [a0, b0, t] : m.bonds) {
    int a = std::min(a0, b0), b = std::max(a0, b0);
    if (t != 0 || ring_bonds.count({a, b})) continue;
    if (m.degree(a) < 2 || m.degree(b) < 2) continue;
    if (amide(a, b) || amide(b, a)) continue;
    ++count;
  }
  return count;
}

int aromatic_rings_of(const Mol& arom) {  // expects aromatic-perceived mol
  int n = 0;
  for (auto& ring : find_rings(arom)) {
    bool all_arom = true;
    for (int i : ring)
      if (!arom.atoms[i].aromatic) { all_arom = false; break; }
    if (all_arom) ++n;
  }
  return n;
}

double tpsa_of(const Mol& m) {  // expects aromatic-perceived mol
  double total = 0.0;
  for (int i = 0; i < m.n(); ++i) {
    const Atom& atom = m.atoms[i];
    const std::string& el = atom.element;
    int q = atom.charge;
    if (el != "N" && el != "O" && el != "S" && el != "P") continue;
    int n_h = implicit_h(m, i);
    int deg = m.degree(i);
    bool arom = atom.aromatic;
    int n_single = 0, n_double = 0, n_triple = 0;
    for (int j : m.neighbors(i)) {
      int t = m.bond_type(i, j);
      if (t == 0 || t == 3) ++n_single;
      else if (t == 1) ++n_double;
      else if (t == 2) ++n_triple;
    }
    if (el == "N" && q == 0) {
      if (arom) {
        if (n_h == 0 && deg == 2) total += 12.89;
        else if (n_h == 1) total += 15.79;
        else if (deg == 3) total += 4.93;
        else total += 12.89;
      } else if (n_triple == 1 && deg == 1) total += 23.79;
      else if (n_double == 1 && deg == 2 && n_h == 0) total += 12.36;
      else if (n_double == 1 && n_h == 0) total += 11.68;
      else if (n_h == 0 && deg == 3) total += 3.24;
      else if (n_h == 1 && deg == 2) total += 12.03;
      else if (n_h == 2 && deg == 1) total += 26.02;
      else if (n_h == 1 && n_double == 1) total += 23.85;
      else total += 12.03;
    } else if (el == "N" && q == 1) {
      if (n_h == 0) total += deg == 4 ? 0.0 : 3.01;
      else if (n_h == 1) total += 4.44;
      else if (n_h == 2) total += 16.61;
      else if (n_h == 3) total += 27.64;
    } else if (el == "O" && q == 0) {
      if (arom) total += 13.14;
      else if (n_double == 1 && deg == 1) total += 17.07;
      else if (n_h == 1) total += 20.23;
      else if (deg == 2) total += 9.23;
      else total += 9.23;
    } else if (el == "O" && q == -1) {
      total += 23.06;
    } else if (el == "S" && q == 0) {
      if (arom) total += deg == 2 ? 28.24 : 21.70;
      else if (n_double == 1 && deg == 1) total += 32.09;
      else if (n_h == 1) total += 38.80;
      else total += deg == 2 ? 25.30 : 19.21;
    }
  }
  return total;
}

double alogp_of(const Mol& m) {  // expects aromatic-perceived mol
  double total = 0.0;
  for (int i = 0; i < m.n(); ++i) {
    const Atom& atom = m.atoms[i];
    const std::string& el = atom.element;
    int n_h = implicit_h(m, i);
    bool hetero_nbr = false;
    for (int j : m.neighbors(i))
      if (m.atoms[j].element != "C" && m.atoms[j].element != "H")
        hetero_nbr = true;
    if (el == "C") {
      if (atom.aromatic) total += hetero_nbr ? 0.137 : 0.294;
      else total += hetero_nbr ? -0.027 : 0.142;
      total += 0.123 * n_h;
    } else if (el == "N") {
      total += atom.aromatic ? -0.49 : -0.60;
      total += -0.25 * n_h;
    } else if (el == "O") {
      total += atom.aromatic ? -0.04 : -0.45;
      total += -0.32 * n_h;
    } else if (el == "S") total += 0.65;
    else if (el == "F") total += 0.43;
    else if (el == "Cl") total += 0.76;
    else if (el == "Br") total += 0.89;
    else if (el == "I") total += 1.05;
    else if (el == "P") total += 0.27;
  }
  return total;
}

int longest_chain_from(const Mol& m, int start, const std::set<int>& ring_atoms,
                       int depth = 0) {
  if (depth > 12) return 0;
  int best = 1;
  for (int j : m.neighbors(start)) {
    if (!ring_atoms.count(j) && m.atoms[j].element == "C" && j > start)
      best = std::max(best,
                      1 + longest_chain_from(m, j, ring_atoms, depth + 1));
  }
  return best;
}

int structural_alerts_of(const Mol& m) {
  int alerts = 0;
  for (int i = 0; i < m.n(); ++i) {
    const Atom& atom = m.atoms[i];
    const std::string& el = atom.element;
    auto nbrs = m.neighbors(i);
    if (el == "N") {
      int n_o = 0;
      bool dbl_o = false;
      for (int j : nbrs)
        if (m.atoms[j].element == "O") {
          ++n_o;
          if (m.bond_type(i, j) == 1) dbl_o = true;
        }
      if (n_o >= 2 && dbl_o) ++alerts;  // nitro
    }
    if (el == "C" && implicit_h(m, i) >= 1) {
      for (int j : nbrs)
        if (m.atoms[j].element == "O" && m.bond_type(i, j) == 1) {
          ++alerts;  // aldehyde
          break;
        }
    }
    if (el == "S" && implicit_h(m, i) >= 1) ++alerts;  // thiol
    if (el == "C") {
      bool has_dbl_o = false, has_hal = false;
      for (int j : nbrs) {
        const std::string& e2 = m.atoms[j].element;
        if (e2 == "O" && m.bond_type(i, j) == 1) has_dbl_o = true;
        if (e2 == "F" || e2 == "Cl" || e2 == "Br" || e2 == "I") has_hal = true;
      }
      if (has_dbl_o && has_hal) ++alerts;  // acyl halide
    }
    if (el == "N") {
      for (int j : nbrs) {
        int t = m.bond_type(i, j);
        if (m.atoms[j].element == "N" && (t == 1 || t == 2)) {
          ++alerts;  // azide / diazo
          break;
        }
      }
    }
  }
  std::set<int> ring_atoms;
  for (auto& ring : find_rings(m)) ring_atoms.insert(ring.begin(), ring.end());
  int chain = 0;
  for (int i = 0; i < m.n(); ++i)
    if (m.atoms[i].element == "C" && !ring_atoms.count(i))
      chain = std::max(chain, longest_chain_from(m, i, ring_atoms));
  if (chain >= 7) ++alerts;
  return alerts;
}

// QED ADS parameters: a, b, c, d, e, f, dmax (Bickerton et al. 2012)
const double kADS[8][7] = {
    {2.817065973, 392.5754953, 290.7489764, 2.419764353, 49.22325677,
     65.37051707, 104.9805561},                             // MW
    {3.172690585, 137.8624751, 2.534937431, 4.581497897, 0.822739154,
     0.576295591, 131.3186604},                             // ALOGP
    {2.948620388, 160.4605972, 3.615294657, 4.435986202, 0.290141953,
     1.300669958, 148.7763046},                             // HBA
    {1.618662227, 1010.051101, 0.985094388, 0.000000001, 0.713820843,
     0.920922555, 258.1632616},                             // HBD
    {1.876861559, 125.2232657, 62.90773554, 87.83366614, 12.01999824,
     28.51324732, 104.5686167},                             // PSA
    {0.010000000, 272.4121427, 2.558379970, 1.565547684, 1.271567166,
     2.758063707, 105.4420403},                             // ROTB
    {3.217788970, 957.7374108, 2.274627939, 0.000000001, 1.317690384,
     0.375760881, 312.3372610},                             // AROM
    {0.010000000, 1199.094025, -0.09002593, 0.000000001, 0.185904477,
     0.875193782, 417.7253140}};                            // ALERTS
const double kQEDWeights[8] = {0.66, 0.46, 0.05, 0.61, 0.06, 0.65, 0.48, 0.95};

double ads_eval(double x, const double* p) {
  double a = p[0], b = p[1], c = p[2], d = p[3], e = p[4], f = p[5],
         dmax = p[6];
  double val = a + b / (1 + std::exp(-(x - c + d / 2) / e)) *
                       (1 - 1 / (1 + std::exp(-(x - c - d / 2) / f)));
  return val / dmax;
}

double qed_of(const Mol& m) {
  if (m.n() == 0) return 0.0;
  // tpsa/alogp/aromatic_rings act on an aromatic-perceived copy; the rest
  // on the raw molecule (mirror of descriptors.py _ensure_aromatic usage)
  Mol arom = m;
  bool any_arom = false;
  for (auto& a : arom.atoms) any_arom |= a.aromatic;
  if (!any_arom) perceive_aromaticity(&arom);
  double props[8] = {
      mol_weight_of(m),          alogp_of(arom),
      (double)hba_of(m),         (double)hbd_of(m),
      tpsa_of(arom),             (double)rotatable_bonds_of(m),
      (double)aromatic_rings_of(arom),
      (double)structural_alerts_of(m)};
  double t = 0.0, wsum = 0.0;
  for (int k = 0; k < 8; ++k) {
    double d = std::max(ads_eval(props[k], kADS[k]), 1e-10);
    t += kQEDWeights[k] * std::log(d);
    wsum += kQEDWeights[k];
  }
  return std::exp(t / wsum);
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Emits the full decoding route for one SMILES.
// Layout per subgraph r (reference HDF order: full graph + terminate APD
// first, then progressively truncated):
//   nodes_out[r]: [max_n, n_feat] int8
//   edges_out[r]: [max_n, max_n, n_edge] int8
//   apd_out[r]:   [apd_len] int8
// Returns number of subgraphs written, 0 if molecule skipped (parse/
// featurization failure), -1 if cap exceeded, -2 bad args.
int mk_route(const char* smiles,
             const char* atom_types_joined,  // e.g. "C;N;O;S;Cl"
             const int* charges, int n_charges,
             const int* imp_hs, int n_imp_h,  // n_imp_h==0 -> unused
             int n_edge_types, int max_n_nodes, int use_canon, int use_bfs,
             int use_aromatic,
             int8_t* nodes_out, int8_t* edges_out, int8_t* apd_out, int cap) {
  if (!smiles || !atom_types_joined || cap <= 0) return -2;
  if (use_aromatic && n_edge_types < 4) return -2;
  Mol m;
  // use_aromatic_bonds mode: keep aromatic (type-3) bonds un-kekulized
  // (mirror of data/preprocess.py mol_from_smiles kekulize_mol flag)
  if (!parse_smiles(smiles, &m, /*kekulize_mol=*/!use_aromatic)) return 0;
  int n = m.n();
  if (n == 0 || n > max_n_nodes) return 0;

  // vocabulary
  std::vector<std::string> atom_types;
  {
    std::string s(atom_types_joined), cur;
    for (char c : s) {
      if (c == ';') { atom_types.push_back(cur); cur.clear(); }
      else cur.push_back(c);
    }
    if (!cur.empty()) atom_types.push_back(cur);
  }
  int n_at = (int)atom_types.size();
  int n_feat = n_at + n_charges + n_imp_h;
  int f_add_per_node = n_at * n_charges * (n_imp_h > 0 ? n_imp_h : 1)
                       * n_edge_types;
  int len_f_add = max_n_nodes * f_add_per_node;
  int len_f_conn = max_n_nodes * n_edge_types;
  int apd_len = len_f_add + len_f_conn + 1;

  // featurize
  std::vector<std::vector<int>> feat(n);  // per-atom one-hot column indices
  for (int i = 0; i < n; ++i) {
    int at = -1, ch = -1, ih = -1;
    for (int k = 0; k < n_at; ++k)
      if (atom_types[k] == m.atoms[i].element) at = k;
    for (int k = 0; k < n_charges; ++k)
      if (charges[k] == m.atoms[i].charge) ch = k;
    if (n_imp_h > 0) {
      int h = implicit_h(m, i);
      for (int k = 0; k < n_imp_h; ++k)
        if (imp_hs[k] == h) ih = k;
      if (ih < 0) return 0;
    }
    if (at < 0 || ch < 0) return 0;
    feat[i] = {at, ch};
    if (n_imp_h > 0) feat[i].push_back(ih);
  }
  for (auto& [a, b, t] : m.bonds)
    if (t >= n_edge_types) return 0;

  // ordering
  std::vector<int> ranking;
  if (use_canon) {
    ranking = canonical_ranks(m);
  } else {
    ranking.resize(n);
    for (int i = 0; i < n; ++i) ranking[i] = i;  // caller shuffles via canon
  }
  std::vector<std::vector<int>> nbrs(n);
  {
    // neighbor lists in ascending index order (mirror of numpy nonzero)
    std::vector<std::vector<char>> adjm(n, std::vector<char>(n, 0));
    for (auto& [a, b, t] : m.bonds) adjm[a][b] = adjm[b][a] = 1;
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        if (adjm[i][j]) nbrs[i].push_back(j);
  }
  std::vector<int> ordering;
  int init = n > 0 ? ranking[0] : 0;
  if (n > 1) {
    ordering = use_bfs ? bfs_ordering(nbrs, n, ranking, init)
                       : dfs_ordering(nbrs, n, ranking, init);
    if (ordering.empty()) return 0;  // disconnected
  } else {
    ordering = {0};
  }

  // build padded int8 graph state in the new ordering
  int M = max_n_nodes;
  std::vector<int8_t> nodes(M * n_feat, 0);
  std::vector<int8_t> edges(M * M * n_edge_types, 0);
  std::vector<int> pos(n);  // old index -> new index
  for (int k = 0; k < n; ++k) pos[ordering[k]] = k;
  for (int old_i = 0; old_i < n; ++old_i) {
    int i = pos[old_i];
    nodes[i * n_feat + feat[old_i][0]] = 1;
    nodes[i * n_feat + n_at + feat[old_i][1]] = 1;
    if (n_imp_h > 0) nodes[i * n_feat + n_at + n_charges + feat[old_i][2]] = 1;
  }
  auto E = [&](int i, int j, int t) -> int8_t& {
    return edges[(i * M + j) * n_edge_types + t];
  };
  for (auto& [a, b, t] : m.bonds) {
    E(pos[a], pos[b], t) = 1;
    E(pos[b], pos[a], t) = 1;
  }

  int route_len = (int)m.bonds.size() + 2;
  if (route_len > cap) return -1;

  auto write_state = [&](int r) {
    std::memcpy(nodes_out + (size_t)r * M * n_feat, nodes.data(),
                M * n_feat);
    std::memcpy(edges_out + (size_t)r * M * M * n_edge_types, edges.data(),
                M * M * n_edge_types);
  };

  // r = 0: full graph + terminate APD
  write_state(0);
  std::memset(apd_out, 0, apd_len);
  apd_out[apd_len - 1] = 1;

  int n_nodes = n;
  auto bonded_to_last = [&](int last) {
    std::vector<int> out;
    for (int t = 0; t < n_edge_types; ++t)
      for (int v = 0; v < M; ++v)
        if (E(v, last, t)) out.push_back(v);
    return out;
  };

  for (int r = 1; r < route_len; ++r) {
    int8_t* apd = apd_out + (size_t)r * apd_len;
    std::memset(apd, 0, apd_len);
    int last = n_nodes - 1;
    // APD of current state (mirror of decoding_apd)
    {
      std::vector<int> fv;  // segment indices of last node's features
      for (int c = 0; c < n_feat; ++c)
        if (nodes[last * n_feat + c]) fv.push_back(c);
      // convert to per-segment indices
      std::vector<int> seg{fv[0]};
      int offs[2] = {n_at, n_at + n_charges};
      for (size_t k = 1; k < fv.size(); ++k) seg.push_back(fv[k] - offs[k - 1]);

      auto bonded = bonded_to_last(last);
      if (!bonded.empty()) {
        int v = bonded.back();
        int bt = 0;
        for (int t = 0; t < n_edge_types; ++t)
          if (E(v, last, t)) { bt = t; break; }
        if ((int)bonded.size() > 1) {
          apd[len_f_add + v * n_edge_types + bt] = 1;
        } else {
          // f_add index: [v, atom, charge, (h), bond] row-major
          int idx = v;
          idx = idx * n_at + seg[0];
          idx = idx * n_charges + seg[1];
          if (n_imp_h > 0) idx = idx * n_imp_h + seg[2];
          idx = idx * n_edge_types + bt;
          apd[idx] = 1;
        }
      } else {
        int idx = 0;
        idx = idx * n_at + seg[0];
        idx = idx * n_charges + seg[1];
        if (n_imp_h > 0) idx = idx * n_imp_h + seg[2];
        idx = idx * n_edge_types + 0;
        apd[idx] = 1;
      }
    }
    // truncate (mirror of truncate_graph)
    if (n_nodes == 1) {
      std::memset(nodes.data() + last * n_feat, 0, n_feat);
      n_nodes = 0;
    } else {
      auto bonded = bonded_to_last(last);
      if (bonded.size() == 1) {
        std::memset(nodes.data() + last * n_feat, 0, n_feat);
        int v = bonded[0];
        for (int t = 0; t < n_edge_types; ++t) E(v, last, t) = E(last, v, t) = 0;
        n_nodes -= 1;
      } else {
        int v = bonded.back();
        for (int t = 0; t < n_edge_types; ++t) E(v, last, t) = E(last, v, t) = 0;
      }
    }
    write_state(r);
  }
  return route_len;
}

// Batch graph -> (validity, canonical SMILES) for generated graphs: the
// host boundary of the generate/fine-tune jobs (reference:
// GraphGenerator.py:659-804 hands graphs to RDKit here; we hand them to the
// same valence model + WL canonicalizer the preprocessing kernel uses).
//
//   nodes_in:  [B, M, n_feat] int8 one-hot rows
//   edges_in:  [B, M, M, n_edge_types] int8
//   n_nodes:   [B] int32
//   validity_out: [B] int8 (MolGraph.is_valid mirror)
//   smiles_out:   [B * smi_cap] char, NUL-terminated rows; empty row ==
//                 python None (unbuildable molecule / overlong string)
//
// n_chirality == 0 means chirality features absent (use_chirality=False).
// Returns B, or -2 on bad args.  Rows are independent: processed in
// n_threads slices (n_threads <= 0 -> hardware concurrency).
int mk_decode_batch(const int8_t* nodes_in, const int8_t* edges_in,
                    const int* n_nodes, int B, int M,
                    const char* atom_types_joined, const int* charges,
                    int n_charges, const int* imp_hs, int n_imp_h,
                    int n_chirality, int chirality_none_idx, int n_edge_types,
                    int n_threads, int8_t* validity_out, char* smiles_out,
                    int smi_cap) {
  if (!nodes_in || !edges_in || !n_nodes || !validity_out || !smiles_out ||
      B <= 0 || M <= 0 || smi_cap <= 1)
    return -2;
  std::vector<std::string> atom_types;
  {
    std::string s(atom_types_joined), cur;
    for (char c : s) {
      if (c == ';') { atom_types.push_back(cur); cur.clear(); }
      else cur.push_back(c);
    }
    if (!cur.empty()) atom_types.push_back(cur);
  }
  int n_at = (int)atom_types.size();
  int n_feat = n_at + n_charges + n_imp_h + n_chirality;

  auto decode_row = [&](int i) {
    const int8_t* nodes = nodes_in + (size_t)i * M * n_feat;
    const int8_t* edges = edges_in + (size_t)i * M * M * n_edge_types;
    char* smi = smiles_out + (size_t)i * smi_cap;
    smi[0] = '\0';
    validity_out[i] = 0;
    Mol mol;
    if (!tensors_to_mol(nodes, edges, n_nodes[i], M, n_edge_types, atom_types,
                        charges, n_charges, imp_hs, n_imp_h, n_chirality,
                        chirality_none_idx, &mol))
      return;  // molecule is None: invalid, SMILES None
    validity_out[i] = sanitize_ok(mol) ? 1 : 0;
    // aromatic systems must admit a kekule structure (mirror of
    // molecule.sanitize: RDKit rejects un-kekulizable aromatics; generated
    // graphs in use_aromatic_bonds mode can place type-3 bonds freely)
    if (validity_out[i]) {
      bool has_arom = false;
      for (auto& [a, b, t] : mol.bonds)
        if (t == 3) { has_arom = true; break; }
      if (has_arom) {
        Mol kek = mol;
        if (!kekulize(&kek)) validity_out[i] = 0;
      }
    }
    std::string s;
    if (mol_to_smiles(mol, &s) && (int)s.size() < smi_cap)
      std::memcpy(smi, s.c_str(), s.size() + 1);
  };

  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min(n_threads, B);
  if (n_threads <= 1) {
    for (int i = 0; i < B; ++i) decode_row(i);
  } else {
    std::vector<std::thread> pool;
    for (int w = 0; w < n_threads; ++w) {
      pool.emplace_back([&, w]() {
        for (int i = w; i < B; i += n_threads) decode_row(i);
      });
    }
    for (auto& th : pool) th.join();
  }
  return B;
}

// Batch graph -> QED drug-likeness score (mirror of chem/descriptors.qed;
// RL scoring hot path, reference ScoringFunction.py:131-143).  Unbuildable
// molecules score 0.0 exactly like the python qed(None)/except path.
int mk_qed_batch(const int8_t* nodes_in, const int8_t* edges_in,
                 const int* n_nodes, int B, int M,
                 const char* atom_types_joined, const int* charges,
                 int n_charges, const int* imp_hs, int n_imp_h,
                 int n_chirality, int chirality_none_idx, int n_edge_types,
                 int n_threads, double* qed_out) {
  if (!nodes_in || !edges_in || !n_nodes || !qed_out || B <= 0 || M <= 0)
    return -2;
  std::vector<std::string> atom_types;
  {
    std::string s(atom_types_joined), cur;
    for (char c : s) {
      if (c == ';') { atom_types.push_back(cur); cur.clear(); }
      else cur.push_back(c);
    }
    if (!cur.empty()) atom_types.push_back(cur);
  }
  auto qed_row = [&](int i) {
    qed_out[i] = 0.0;
    Mol mol;
    if (!tensors_to_mol(nodes_in + (size_t)i * M *
                            ((int)atom_types.size() + n_charges + n_imp_h +
                             n_chirality),
                        edges_in + (size_t)i * M * M * n_edge_types,
                        n_nodes[i], M, n_edge_types, atom_types, charges,
                        n_charges, imp_hs, n_imp_h, n_chirality,
                        chirality_none_idx, &mol))
      return;
    qed_out[i] = qed_of(mol);
  };
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min(n_threads, B);
  if (n_threads <= 1) {
    for (int i = 0; i < B; ++i) qed_row(i);
  } else {
    std::vector<std::thread> pool;
    for (int w = 0; w < n_threads; ++w)
      pool.emplace_back([&, w]() {
        for (int i = w; i < B; i += n_threads) qed_row(i);
      });
    for (auto& th : pool) th.join();
  }
  return B;
}

int mk_version() { return 3; }

}  // extern "C"
